"""Mechanical audit of the verification-prefix rotation.

The round driver's correctness gate checks the FIRST 50 entries of
``queries.PREFIX_ORDER`` against their DuckDB oracles each round and
records ``CORRECTNESS_r{N}.json``.  Rotation rules (see the PREFIX_ORDER
comment block and memory/round-driver-protocol):

* any query whose code OR oracle text changes must re-enter the prefix;
* unchanged green rows "stand" but decay — no row should go more than
  ~4 rounds without a fresh green row;
* never-driver-checked entries must be scheduled before stale ones.

This tool derives, from the committed artifacts alone:

* per-query: every round it was checked, every green round, last green;
* the never-checked set and a staleness ladder (oldest last-green first);
* a cross-check of the NEXT-round plan parsed out of the
  ``ROUND-<N> ROTATION PLAN`` comment in ``queries/__init__.py`` —
  the plan must (a) name exactly 50 registry entries, (b) contain every
  never-checked entry, (c) contain the 50 stalest rows (ties broken by
  the plan itself), and (d) leave no row older than the plan's own
  oldest non-member.

Run:  python tools/rotation_audit.py          # audit + ladder summary
      python tools/rotation_audit.py --plan   # also print the parsed plan
Exit code 0 = plan consistent with artifacts; 1 = violation (printed).

Lapse events (code/oracle edits that invalidate an old green row) are
not recoverable from the JSON artifacts; they are tracked in the ledger
comments.  This audit treats a round-changed query as covered only if
it re-entered a later prefix — which the ledger discipline guarantees —
so its "last green" here is a lower bound that is exact for unchanged
queries.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG_INIT = REPO / "ifcb_data_pipeline_spark" / "queries" / "__init__.py"


def correctness_history() -> dict[str, dict[int, bool]]:
    """name -> {round: fully_green}.  Green = rows+schema+hash all true
    (hash_match may be absent for rows-only entries: then rows+schema)."""
    hist: dict[str, dict[int, bool]] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        data = json.loads(path.read_text())
        for name, row in data.items():
            ok = bool(row.get("rows_match")) and bool(row.get("schema_match"))
            if "hash_match" in row and row["hash_match"] is not None:
                ok = ok and bool(row["hash_match"])
            ok = ok and not row.get("err")
            hist.setdefault(name, {})[rnd] = ok
    return hist


def registry_names() -> tuple[list[str], list[str]]:
    sys.path.insert(0, str(REPO))
    from ifcb_data_pipeline_spark.queries import PREFIX_ORDER, REGISTRY, load_all

    load_all()
    return list(REGISTRY), list(PREFIX_ORDER)


def parsed_plan() -> tuple[int, list[str]] | None:
    """Parse the `ROUND-<N> ROTATION PLAN` comment block, return
    (round, names in order) or None if absent.

    The block is terminated by an explicit ``# END PLAN`` sentinel so
    that narrative comment paragraphs following the plan (root-cause
    notes, sweep ledgers) can't leak query names into the parsed plan
    (ADVICE r8: the earlier greedy ``(#.*\\n)+`` swallowed every
    contiguous comment line).  A plan header without the sentinel is a
    hard error — better loud than a silently-padded plan.
    """
    text = PKG_INIT.read_text()
    m = re.search(r"# ROUND-(\d+) ROTATION PLAN", text)
    if not m:
        return None
    rnd = int(m.group(1))
    end = text.find("# END PLAN", m.end())
    if end < 0:
        raise SystemExit(
            "ROTATION PLAN comment found but no '# END PLAN' sentinel — "
            "add one so the parser can't swallow trailing narrative"
        )
    block = text[m.start():end]
    # Names are snake_case identifiers with a family prefix + digit(s).
    names = re.findall(r"\b([a-z]+\d*[a-z]?\d*_[a-z0-9_]+)\b", block)
    seen, ordered = set(), []
    for n in names:
        if n not in seen:
            seen.add(n)
            ordered.append(n)
    return rnd, ordered


def main() -> int:
    show_plan = "--plan" in sys.argv
    names, prefix = registry_names()
    hist = correctness_history()
    latest_round = max((r for h in hist.values() for r in h), default=0)

    raw_last_green = {
        n: max((r for r, ok in hist.get(n, {}).items() if ok), default=None)
        for n in names
    }
    last_green = dict(raw_last_green)
    reds_latest = [
        n for n in names if hist.get(n, {}).get(latest_round) is False
    ]

    # The CURRENT PREFIX_ORDER[:50] will be checked by the driver at
    # round latest+1 (this round's gate hasn't produced its artifact
    # yet).  A NEXT-round (latest+2) plan must therefore be judged
    # against the projected state: current-prefix rows get a
    # latest+1 row (assumed green; a red there takes slot 1 of the
    # next plan by rule, which we can only check once the artifact
    # lands — re-audit then).  EXCEPTION (VERDICT r8 item 5, the label
    # off-by-one): if the latest artifact already covers exactly the
    # live prefix, that prefix's round HAS landed — project nothing,
    # the raw ladder is the truth.
    latest_checked = {n for n, h in hist.items() if latest_round in h}
    prefix_landed = set(prefix[:50]) <= latest_checked
    if prefix_landed:
        print(
            f"live prefix already covered by CORRECTNESS_r{latest_round:02d} "
            f"— no projection applied"
        )
    else:
        pending_round = latest_round + 1
        for n in prefix[:50]:
            last_green[n] = pending_round
        reds_pending = [n for n in reds_latest if n in prefix[:50]]
        if reds_pending:
            print(
                f"note: r{latest_round:02d} reds {sorted(reds_pending)} are in "
                f"the current prefix — projected green for r{pending_round:02d}; "
                f"re-audit once CORRECTNESS_r{pending_round:02d}.json lands"
            )
            reds_latest = [n for n in reds_latest if n not in reds_pending]
    never = [n for n in names if last_green[n] is None]

    ladder: dict[int, list[str]] = {}
    for n, lg in last_green.items():
        if lg is not None:
            ladder.setdefault(lg, []).append(n)

    print(f"registry entries: {len(names)}")
    print(f"artifact rounds seen: {sorted({r for h in hist.values() for r in h})}")
    print(f"never driver-checked ({len(never)}): {sorted(never)}")
    if reds_latest:
        print(f"RED in r{latest_round:02d}: {sorted(reds_latest)}")
    for rnd in sorted(ladder):
        print(f"last-green r{rnd:02d}: {len(ladder[rnd]):3d} rows")

    plan = parsed_plan()
    violations: list[str] = []
    if plan is None:
        print("no ROTATION PLAN comment found — nothing to cross-check")
    else:
        plan_round, plan_names = plan
        plan_names = [n for n in plan_names if n in set(names)]
        print(f"\nROUND-{plan_round} plan: {len(plan_names)} registry names parsed")
        if show_plan:
            for n in plan_names:
                print(f"  {n}")
        if len(plan_names) != 50:
            violations.append(
                f"plan names {len(plan_names)} registry entries, expected 50"
            )
        missing_never = sorted(set(never) - set(plan_names))
        if missing_never:
            violations.append(f"never-checked entries absent from plan: {missing_never}")
        # Staleness optimality, judged on PRE-projection ages so the
        # check is stable before and after the plan becomes the live
        # prefix: every row outside plan ∪ current-prefix must be at
        # least as fresh as the freshest previously-green plan member.
        plan_lg = [
            raw_last_green[n] for n in plan_names if raw_last_green[n] is not None
        ]
        if plan_lg:
            newest_in_plan = max(plan_lg)
            covered = set(plan_names) | set(prefix[:50])
            worse_outside = sorted(
                n
                for n in names
                if n not in covered
                and raw_last_green[n] is not None
                and raw_last_green[n] < newest_in_plan
            )
            if worse_outside:
                violations.append(
                    f"rows staler than the plan's newest member but left out: "
                    f"{worse_outside}"
                )
        if reds_latest:
            not_first = [n for n in reds_latest if n not in plan_names[:len(reds_latest)]]
            if not_first:
                violations.append(
                    f"latest-round red rows must take the first plan slots: {not_first}"
                )

    if violations:
        print("\nVIOLATIONS:")
        for v in violations:
            print(f"  - {v}")
        return 1
    print("\nplan consistent with artifacts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
