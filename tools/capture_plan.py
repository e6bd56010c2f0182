"""Capture .explain("formatted") for registry entries into plans/<dir>/.

Usage: python tools/capture_plan.py <outdir> <suffix> <query> [<query> ...]
e.g.   python tools/capture_plan.py plans/r14 before agg_exact_quantiles
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensql_presto_spark.queries import all_specs
from sensql_presto_spark.session import get_spark


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plan")
    specs = all_specs()
    for name in names:
        df = specs[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"{path}: {len(buf.getvalue())} bytes", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
