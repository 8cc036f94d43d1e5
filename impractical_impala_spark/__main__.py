"""CLI: run the reference's business-cycle workload on Spark.

A user of the reference repo runs four R scripts that read the three
WDI CSVs and write 28 stat CSVs. The equivalent here:

    python -m impractical_impala_spark \
        --data-dir /root/reference --out-dir ./out \
        --methods dlog hp hp625 logquad

writes the same 28 files (same names, same columns, values matching to
~1e-13) from a Spark job that scales past the 62-country panel.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="impractical_impala_spark",
                                description=__doc__)
    p.add_argument("--data-dir", required=True,
                   help="directory containing GDP_{SSA,ASIA,LA}_WDI.csv")
    p.add_argument("--out-dir", required=True, help="output directory for CSVs")
    p.add_argument("--methods", nargs="+", default=["dlog", "hp", "hp625", "logquad"],
                   choices=["dlog", "hp", "hp625", "logquad"])
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--golden-csv", action="store_true",
                   help="emit CSVs via pandas for byte-exact "
                        "readr::write_csv float formatting (default: "
                        "distributed executor-side writer)")
    args = p.parse_args(argv)

    from .plans import wdi
    from .session import get_spark

    spark = get_spark("iis-wdi-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    outputs = wdi.run_all(spark, args.data_dir, methods=tuple(args.methods))
    wdi.write_csv_outputs(outputs, args.out_dir, golden=args.golden_csv)
    print(f"wrote {len(outputs)} outputs to {args.out_dir} "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
