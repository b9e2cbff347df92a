"""Audit (r15): which keys' physical plans scan the same parquet file
(or re-evaluate the same Python stage) many times?

The round's biggest wins came from multi-branch re-evaluation
(l_ann_ivfpq scanned embeddings.parquet 28x, l_sparse_cosine_topk
scanned documents 6x).  This sweep counts, per registered key, the
number of `Scan parquet` nodes per table and the number of
MapInPandas/ArrowEvalPython nodes in the final plan, flagging keys
whose counts suggest a persist/restructure candidate.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> None:
    from bristle_spark.registry import all_specs
    from bristle_spark.session import get_spark

    specs = all_specs()
    spark = get_spark(app_name="audit-repeated-scans")
    sf = "/root/testdata/sf0.1"
    rows = []
    for name in sorted(specs):
        try:
            df = specs[name].fn(spark, sf)
            s = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple")
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}", file=sys.stderr)
            continue
        tables = re.findall(r"FileScan parquet \[[^\]]*\]|Scan parquet\s*$", s, re.M)
        # count scans per source file from the InMemoryFileIndex paths
        locs = re.findall(r"file:[^\s,\]]+?([a-z_0-9]+)\.parquet", s)
        from collections import Counter
        c = Counter(locs)
        py = len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython", s))
        worst = c.most_common(1)[0] if c else ("-", 0)
        if worst[1] >= 3 or py >= 4:
            rows.append((name, dict(c), py))
    print(f"{len(rows)} keys scanning a table 3+ times (or 4+ Python stages):")
    for name, c, py in sorted(rows, key=lambda r: -max(r[1].values() or [0])):
        print(f"  {name:36s} scans={c} python_nodes={py}")


if __name__ == "__main__":
    main()
