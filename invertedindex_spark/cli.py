"""Interactive query REPL — parity with the reference's command line
(``QueryProcessor.commandLine``, QueryProcessor.java:63-82):
``[AND|OR] term1 … termN`` per line, prints ``doc_no score`` for the
top-k plus elapsed seconds; quit codes Q/q/QUIT/quit/EXIT/exit.

Usage:
    python -m invertedindex_spark.cli /path/to/warehouse [-k 20]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("warehouse")
    ap.add_argument("-k", type=int, default=20)  # Constants.java:48
    ap.add_argument("--prune", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .operators.query import InvertedIndex

    spark = (SparkSession.builder.master("local[*]")
             .appName("invertedindex-cli")
             .config("spark.ui.enabled", "false").getOrCreate())
    idx = InvertedIndex(spark, args.warehouse)
    quit_codes = {"Q", "q", "QUIT", "quit", "EXIT", "exit"}
    print("Starting the command line..")
    print("Input Format: [AND|OR] term1 ... termN")
    try:
        while True:
            try:
                line = input("> ")
            except EOFError:
                break
            if line in quit_codes:
                print("Shutting down...")
                break
            if not line.strip():
                continue
            t0 = time.time()
            try:
                for doc_no, score in idx.search(line, args.k,
                                                prune=args.prune):
                    print(doc_no, score)
            except ValueError as e:
                print(e)
                print("Input Format: [AND|OR] term1 ... termN")
            print(f"{time.time() - t0} seconds")
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
