"""Audit (r15): which keys' final orderBy range-partitioner samples an
exchange-free child subtree?

A global Sort's range exchange runs a bounds-sampling job over its
child; if no shuffle boundary exists below it, that sampling pass
re-executes the child plan (scan + every expression / Python stage) a
second time.  The codec family paid ~2x for this (fixed by
multimodal_q._present); this audit finds every other key with the same
shape so the fix (or a measured leave-alone) is deliberate.

For each registered key: parse the formatted plan tree, locate the
Exchange whose Arguments are rangepartitioning, and report whether any
other Exchange / AQEShuffleRead lies in its subtree.  Keys where the
range exchange is the ONLY exchange on its input chain re-execute the
whole chain during sampling.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def tree_lines(s: str) -> list[tuple[int, str, int]]:
    """(indent, node_name, node_id) for each tree-header line."""
    out = []
    for line in s.splitlines():
        if not line or line.startswith("=="):
            continue
        m = re.match(r"^([+:|\-\s]*)([A-Za-z][A-Za-z0-9 .]*)\s+\((\d+)\)\s*$", line)
        if m:
            out.append((len(m.group(1)), m.group(2).strip(), int(m.group(3))))
        elif out and not line.startswith(" "):
            break  # details section reached
    return out


def subtree_ids(lines, idx) -> list[int]:
    """Node ids in the subtree rooted at lines[idx] (deeper indent until
    indent returns to <= root's)."""
    root_indent = lines[idx][0]
    ids = []
    for i in range(idx + 1, len(lines)):
        if lines[i][0] <= root_indent:
            break
        ids.append(lines[i][2])
    return ids


def main() -> None:
    from bristle_spark.registry import all_specs
    from bristle_spark.session import get_spark

    specs = all_specs()
    spark = get_spark(app_name="audit-sort-shield")
    sf = "/root/testdata/sf0.1"
    unshielded = []
    for name in sorted(specs):
        try:
            df = specs[name].fn(spark, sf)
            s = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # streaming keys execute side effects; skip errors
            print(f"SKIP {name}: {type(e).__name__}", file=sys.stderr)
            continue
        range_ids = {
            int(m.group(1))
            for m in re.finditer(r"\((\d+)\) Exchange\nInput.*\nArguments: rangepartitioning", s)
        }
        if not range_ids:
            continue
        lines = tree_lines(s)
        id2idx = {nid: i for i, (_, _, nid) in enumerate(lines)}
        for rid in range_ids:
            if rid not in id2idx:
                continue
            below = subtree_ids(lines, id2idx[rid])
            names_below = [lines[id2idx[b]][1] for b in below if b in id2idx]
            has_shield = any(
                n.startswith("Exchange") or n.startswith("AQEShuffleRead")
                for n in names_below
            )
            if not has_shield:
                heavy = [n for n in names_below
                         if n.split()[0] in ("MapInPandas", "ArrowEvalPython",
                                             "BatchEvalPython", "Generate",
                                             "Window", "SortMergeJoin")]
                unshielded.append((name, len(names_below), ",".join(sorted({n.split()[0] for n in names_below}))))
                break
    print(f"\n{len(unshielded)} keys with an exchange-free range-sort child:")
    for name, depth, kinds in unshielded:
        print(f"  {name:36s} depth={depth:2d}  [{kinds}]")


if __name__ == "__main__":
    main()
