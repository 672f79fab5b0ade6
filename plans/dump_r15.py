"""Dump .explain('formatted') for registry queries into plans/r15/.

Usage: python plans/dump_r15.py <suffix> <query> [<query> ...]
       suffix is 'before' or 'after'.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiflow_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-r15")
    spark.sparkContext.setLogLevel("ERROR")
    from tiflow_spark.plans.parity import REGISTRY

    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
