"""Seeded clickstream generator — simulation parity with the reference
producer (SURVEY.md §2.10 G1-G5).

Reproduces the producer's behavioral model as a distributed, deterministic
generator:

- G1 bounded entity pools (users ≤ 1000, products ≤ 500,
  /root/reference/producer/data_generator.py:57-87);
- G2 weighted categorical sampling (8 categories w/ weights
  .25/.20/.15/.10/.10/.10/.05/.05; page types, data_generator.py:22-42);
- G3 Markov-ish event-type probabilities conditioned on session history
  (base 70/20/10 view/cart/purchase mix, data_generator.py:125-155);
- G4 cart state machine: add_to_cart accumulates, purchase amount =
  Σ cart prices × U(0.95, 1.05) and clears the cart
  (producer/producer.py:108-136);
- G5 session lifecycle: end probability grows after 5 min, capped at 0.3
  (producer/producer.py:66-78).

Sessions are independent given their seed, so generation is
embarrassingly parallel: one ``applyInPandas`` over session ids, each
group seeded by (seed, session_id) — the same corpus comes out at any
parallelism, which is what makes this usable as a benchmark/load source
at cluster scale.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CATEGORIES = (
    "electronics", "clothing", "books", "home", "sports", "toys", "beauty", "grocery",
)
CATEGORY_WEIGHTS = (0.25, 0.20, 0.15, 0.10, 0.10, 0.10, 0.05, 0.05)
USER_AGENTS = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)",
    "Mozilla/5.0 (X11; Linux x86_64)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X)",
    "Mozilla/5.0 (Linux; Android 14)",
)

EVENTS_SCHEMA = (
    "event_id string, user_id string, event_type string, product_id string, "
    "purchase_amount double, timestamp timestamp, session_id string, "
    "page_url string, user_agent string, ip_address string"
)

_BASE_TS = dt.datetime(2024, 1, 1)


def _gen_session(session_id: int, seed: int, max_users: int, max_products: int) -> pd.DataFrame:
    rng = np.random.RandomState((seed * 1_000_003 + session_id) % (2**31 - 1))
    user = int(rng.randint(0, max_users))  # G1 bounded pool
    ua = USER_AGENTS[rng.randint(0, len(USER_AGENTS))]
    ip = ".".join(str(rng.randint(1, 255)) for _ in range(4))
    start = _BASE_TS + dt.timedelta(seconds=int(rng.randint(0, 30 * 24 * 3600)))

    rows = []
    t = start
    cart: list[float] = []
    views = 0
    while True:
        # G3: event mix conditioned on session history
        p_cart = 0.2 + (0.1 if views >= 3 else 0.0)
        p_buy = 0.1 + (0.15 if cart else 0.0)
        p_view = max(0.0, 1.0 - p_cart - p_buy)
        ev = rng.choice(["page_view", "add_to_cart", "purchase"], p=[p_view, p_cart, p_buy])
        product = None
        amount = None
        category = str(rng.choice(CATEGORIES, p=CATEGORY_WEIGHTS))  # G2
        if ev == "page_view":
            views += 1
            page = str(rng.choice(["/", f"/category/{category}", "/cart", "/checkout"]))
        else:
            product = f"p{int(rng.randint(0, max_products)):05d}"  # G1
            page = f"/product/{product}"
            price = float(np.round(5.0 + rng.rand() * 495.0, 2))
            if ev == "add_to_cart":
                cart.append(price)
            else:  # G4: purchase amount from cart contents, cart clears
                base = sum(cart) if cart else 20.0 + rng.rand() * 480.0
                amount = float(np.round(base * (0.95 + rng.rand() * 0.10), 2))
                cart = []
        rows.append(
            (
                f"e{session_id:09d}-{len(rows):04d}",
                f"u{user:06d}",
                ev,
                product,
                amount,
                t,
                f"s{session_id:09d}",
                page,
                ua,
                ip,
            )
        )
        # G5: session end probability grows after 5 minutes, capped at 0.3
        elapsed_min = (t - start).total_seconds() / 60.0
        p_end = min(0.3, max(0.02, (elapsed_min - 5.0) * 0.05))
        if rng.rand() < p_end or len(rows) >= 200:
            break
        t = t + dt.timedelta(seconds=int(rng.randint(5, 180)))
    return pd.DataFrame(
        rows,
        columns=[
            "event_id", "user_id", "event_type", "product_id", "purchase_amount",
            "timestamp", "session_id", "page_url", "user_agent", "ip_address",
        ],
    )


def generate_events(
    spark: SparkSession,
    n_sessions: int = 1000,
    seed: int = 42,
    max_users: int = 1000,
    max_products: int = 500,
) -> DataFrame:
    """Deterministic distributed clickstream: one pandas group per session,
    seeded independently — same output at any partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for sid in pdf["id"]:
                yield _gen_session(int(sid), seed, max_users, max_products)

    return (
        spark.range(n_sessions)
        .repartition(max(1, n_sessions // 64))
        .mapInPandas(gen, schema=EVENTS_SCHEMA)
    )
