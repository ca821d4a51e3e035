"""Producer entry point — the engine's counterpart of the reference's
``python -m producer.producer`` (/root/reference/producer/producer.py:286-310).

Instead of posting JSON to Kafka (no broker in this environment), each
batch of the seeded distributed generator lands as one parquet commit in
a staging directory, which the processor's file stream tails exactly like
a topic: one batch -> one discoverable file group. The env-var surface
mirrors the reference's producer config names.

Run: python -m e_commerce_click_stream_spark.producer
Env:
  PRODUCER_OUTPUT          staging dir (default: ./producer_stage)
  PRODUCER_BATCHES         number of batches to emit (default 3)
  PRODUCER_BATCH_SESSIONS  sessions generated per batch (default 100)
  PRODUCER_SLEEP_INTERVAL  seconds between batches (reference name; default 0)
  PRODUCER_MAX_USERS       bounded user pool (reference name; default 1000)
  PRODUCER_MAX_PRODUCTS    bounded product pool (reference name; default 500)
  PRODUCER_SEED            generator seed (default 42)
"""

from __future__ import annotations

import json
import os
import time

from e_commerce_click_stream_spark.datagen import generate_events
from e_commerce_click_stream_spark.session import get_spark


def main() -> None:
    out = os.environ.get("PRODUCER_OUTPUT", "./producer_stage")
    batches = int(os.environ.get("PRODUCER_BATCHES", "3"))
    sessions = int(os.environ.get("PRODUCER_BATCH_SESSIONS", "100"))
    sleep_s = float(os.environ.get("PRODUCER_SLEEP_INTERVAL", "0"))
    max_users = int(os.environ.get("PRODUCER_MAX_USERS", "1000"))
    max_products = int(os.environ.get("PRODUCER_MAX_PRODUCTS", "500"))
    seed = int(os.environ.get("PRODUCER_SEED", "42"))

    spark = get_spark(app_name="clickstream-producer")
    try:
        pre_existing = spark.read.parquet(out).count()
    except Exception:  # first run: directory absent / empty
        pre_existing = 0
    for b in range(batches):
        df = generate_events(
            spark,
            n_sessions=sessions,
            seed=seed + b,  # distinct batch content, still deterministic
            max_users=max_users,
            max_products=max_products,
        )
        df.write.mode("append").parquet(out)
        if sleep_s and b < batches - 1:
            time.sleep(sleep_s)
    # count from the written files: a .count() on the generator DataFrame
    # would re-run the whole mapInPandas generation a second time per batch
    total = spark.read.parquet(out).count() - pre_existing
    print(
        json.dumps(
            {"producer": "done", "batches": batches, "events": total, "output": out}
        )
    )


if __name__ == "__main__":
    main()
