"""Out-of-core repartitioning CLI (reference partition.py:29-77).

The reference needs two passes (scan → per-batch part files → consolidate
fragments); Spark's shuffle replaces both::

    python -m graphique_spark.partition SRC DEST KEY [KEY...] \
        [--sort COL[,COL...]] [--index NAME] [--cpus N]

Reads parquet at SRC, writes hive-partitioned parquet at DEST partitioned
by the KEYs, optionally sorted within partitions, optionally with an
original-row-index column.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src")
    parser.add_argument("dest")
    parser.add_argument("keys", nargs="+")
    parser.add_argument("--sort", default="", help="comma-separated sort-within-partition columns")
    parser.add_argument("--index", default=None, help="name for an original-row-index column")
    parser.add_argument("--cpus", default="*")
    args = parser.parse_args(argv)

    from graphique_spark import get_session
    from graphique_spark.sources import write_partitioned

    spark = get_session(master=f"local[{args.cpus}]", app_name="graphique-partition")
    df = spark.read.parquet(args.src)
    write_partitioned(
        df,
        args.dest,
        keys=args.keys,
        sort_within=[c for c in args.sort.split(",") if c],
        with_index=args.index,
    )


if __name__ == "__main__":
    main()
