"""Per-query bench regression guard: compare the current BENCH_DETAIL.json
against a previous one (default: the committed copy in git HEAD) and flag
queries slower by more than a threshold factor.

Usage:
    python scripts/bench_regress.py                # vs git HEAD's copy
    python scripts/bench_regress.py old.json new.json [factor]

Exit code 1 when any query regressed by more than `factor` (default 2.0)
AND by more than 1 second absolute (sub-second jitter is noise at sf0.1).
"""

from __future__ import annotations

import json
import subprocess
import sys


def load_prev(path: str | None) -> dict:
    if path:
        with open(path) as f:
            return json.load(f)
    blob = subprocess.run(
        ["git", "show", "HEAD:BENCH_DETAIL.json"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(blob)


def main() -> int:
    args = sys.argv[1:]
    factor = 2.0
    if args and args[-1].replace(".", "").isdigit():
        factor = float(args.pop())
    if len(args) == 2:
        old, new = load_prev(args[0]), json.load(open(args[1]))
    elif len(args) == 1:
        # one baseline file, current working copy as the candidate —
        # silently ignoring the argument would answer a different question
        old, new = load_prev(args[0]), json.load(open("BENCH_DETAIL.json"))
    else:
        old, new = load_prev(None), json.load(open("BENCH_DETAIL.json"))
    regressed = []
    for name, t_new in new["queries"].items():
        t_old = old["queries"].get(name)
        if t_old is None:
            continue
        if t_new > t_old * factor and t_new - t_old > 1.0:
            regressed.append((name, t_old, t_new))
    print(
        f"compared {len(new['queries'])} queries "
        f"(baseline has {len(old['queries'])}); "
        f"threshold x{factor} and >1s absolute"
    )
    for name, t_old, t_new in sorted(regressed, key=lambda r: r[1] - r[2]):
        print(f"  REGRESSED {name}: {t_old:.2f}s -> {t_new:.2f}s")
    if not regressed:
        print("  no regressions")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
