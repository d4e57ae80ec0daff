#!/usr/bin/env python
"""Regenerate docs/PLANS.md: the formatted physical plan of every bench
headline query at sf0.01, plus a one-line digest (shuffles, broadcasts,
codegen spans, pushed filters) — the artifact backing docs/SCALE.md's
claims. Run from the repo root: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.plans import (  # noqa: E402
    formatted_plan,
    shuffle_count,
)
from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    from bench import SETS

    HEADLINE = [n for names in SETS.values() for n in names]

    spark = get_spark("plan-dump", cpus=8, shuffle_partitions=8)
    out = [
        "# Physical plans (generated — do not edit)",
        "",
        f"`python tools/dump_plans.py` over `{SF}`; `EXPLAIN FORMATTED` for",
        "each bench headline query, with a digest line per query. AQE is on,",
        "so runtime plans may further coalesce partitions / switch joins.",
        "",
    ]
    for name in HEADLINE:
        df = QUERIES[name].fn(spark, SF)
        # codegen spans aren't visible pre-execution under AQE, so the
        # digest sticks to structural facts.
        digest = (
            f"shuffles={shuffle_count(df)} "
            f"broadcasts={formatted_plan(df).count('BroadcastExchange')}"
        )
        plan = formatted_plan(df)
        # Strip volatile ids so regeneration diffs stay meaningful.
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
        plan = re.sub(r"file:[^\],\s]*", "<path>", plan)
        out.append(f"## {name}\n\n{digest}\n\n```\n{plan.strip()}\n```\n")
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(HEADLINE)} queries)")


if __name__ == "__main__":
    main()
