#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north rule: `run via
spark-submit --py-files on a multi-executor cluster`).

Usage:
  cd /root/repo && zip -qr /tmp/engine.zip hdx_metadata_crawler_spark
  spark-submit --master local[8] --py-files /tmp/engine.zip \
      tools/submit_crawl.py --seeds 2000 --page-size 1000 \
      --ckpt /tmp/crawl_ckpt [--resume]

On a real cluster, --master becomes the cluster manager URL and the same
--py-files zip ships the engine to every executor; nothing in the engine
imports anything outside the zip + pyspark/pandas/numpy.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2000)
    ap.add_argument("--page-size", type=int, default=1000)
    ap.add_argument("--ckpt", default="/tmp/crawl_ckpt")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=100)
    args = ap.parse_args()

    # Imports resolved from --py-files on the executors.
    from pyspark.sql import SparkSession

    from hdx_metadata_crawler_spark.sources import synthetic
    from hdx_metadata_crawler_spark.streaming.frontier import (
        CrawlConfig,
        CrawlEngine,
    )

    spark = SparkSession.builder.appName("hdx-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = CrawlConfig(page_size=args.page_size, max_rounds=args.max_rounds)
    engine = CrawlEngine(spark, args.ckpt, cfg)
    if args.resume:
        out = engine.run(resume=True)
    else:
        out = engine.run(seed_urls=synthetic.seed_urls(args.seeds))
    summary = {
        "final_round": out["final_round"],
        "n_docs": out["state"]["documents"].count(),
        "n_seen": out["state"]["seen"].count(),
        "n_errors": out["state"]["errors"].count(),
        "rounds": out["metrics"],
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
