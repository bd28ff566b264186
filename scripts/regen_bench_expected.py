#!/usr/bin/env python3
"""Regenerate src/main/resources/graft/bench_expected.json from a fresh
bench.json (the full per-query map graft.Bench writes on every run).

The resource feeds Bench's adaptive GC shield: a query measuring over
3x its recorded steady cost (floor: steady + 0.3 s) in min-of-two gets
one more pass from a freshly collected heap. Regenerate ONLY from a
measured-stable local run after a deliberate profile change — inflated
baselines would blind the shield exactly where it is needed.

Usage: python3 scripts/regen_bench_expected.py [bench.json]
"""
import json
import pathlib
import sys

src = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "bench.json")
out = pathlib.Path("src/main/resources/graft/bench_expected.json")
bench = json.loads(src.read_text())
queries = bench["queries"]
bad = {k: v for k, v in queries.items() if v < 0}
if bad:
    sys.exit(f"refusing: failed queries in {src}: {sorted(bad)}")
out.parent.mkdir(parents=True, exist_ok=True)
body = ",\n".join(
    f'  "{k}": {v:.3f}' for k, v in sorted(queries.items()))
out.write_text("{\n" + body + "\n}\n")
print(f"wrote {out} ({len(queries)} queries, "
      f"total {sum(queries.values()):.2f} s from {src})")
