"""Seeded synthetic CDC workload generator (SURVEY.md §2.1 G1).

Replaces the reference's Postgres → Debezium → Kafka capture path with a
deterministic generator that emits the same *event semantics* directly
as envelope rows. Reproduces ``generator/data-generator.py:36-73``:

- for each id in 0..n-1: INSERT a user row and a product row
  (data-generator.py:44-51);
- with P=0.11 immediately UPDATE the username/name
  (``randint(1,100) >= 90``, data-generator.py:55-64);
- with P=0.06 immediately DELETE both rows
  (``randint(1,100) >= 95``, data-generator.py:67-70);
- optionally a leading snapshot batch of op='r' rows
  (``snapshot.mode=initial``, connectors/postgres-source.json:17).

Unlike the reference (unseeded ``random`` + faker — SURVEY.md §7
"non-determinism"), this generator is seeded so tests can be golden.
``lsn`` is strictly increasing across ALL events (Postgres WAL total
order); ``ts_ms`` advances 500 ms per id, mirroring the reference's
``sleep(0.5)`` pacing (data-generator.py:39).

Scale note: events are built driver-side (fine for fixtures); for bulk
loads use ``spark.range(n)`` + the same derivation expressed in columns.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from change_data_capture_poc_spark.cdc.envelope import (
    PRODUCT_FIELDS,
    USER_FIELDS,
    envelope_schema,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _name(rng: random.Random) -> str:
    return f"{rng.choice(_WORDS)} {rng.choice(_WORDS)}"


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(8))


@dataclass
class CdcGenerator:
    """Deterministic envelope-event generator for the two source tables."""

    seed: int = 42
    base_ts_ms: int = 1_700_000_000_000
    step_ms: int = 500  # reference paces 0.5 s per id (data-generator.py:39)
    _lsn: int = field(default=0, init=False)

    def _next_lsn(self) -> int:
        self._lsn += 1000  # Postgres LSNs advance by byte offsets, not by 1
        return self._lsn

    def _env(self, before, after, op, ts_ms):
        return {
            "payload": {
                "before": before,
                "after": after,
                "op": op,
                "ts_ms": ts_ms,
                "source": {"lsn": self._next_lsn()},
            }
        }

    def generate(self, num_records: int = 1000, snapshot_rows: int = 0):
        """Return (product_events, user_events) as lists of envelope dicts.

        ``snapshot_rows`` > 0 emits that many op='r' rows first (the
        initial-snapshot phase, SURVEY.md T4).
        """
        rng = random.Random(self.seed)
        self._lsn = 0  # one WAL per generate() call; lsn interleaves tables
        products: list[dict] = []
        users: list[dict] = []

        for i in range(snapshot_rows):
            ts = self.base_ts_ms - 1000 + i
            prod = {"id": i, "name": _name(rng), "description": _text(rng),
                    "price": float(rng.randint(1, 100))}
            usr = {"id": i, "username": _name(rng).replace(" ", "."),
                   "password": f"pw-{rng.randrange(1 << 30):08x}"}
            products.append(self._env(None, prod, "r", ts))
            users.append(self._env(None, usr, "r", ts))

        state_p: dict[int, dict] = {}
        state_u: dict[int, dict] = {}
        for i in range(snapshot_rows, snapshot_rows + num_records):
            ts = self.base_ts_ms + (i - snapshot_rows) * self.step_ms
            usr = {"id": i, "username": _name(rng).replace(" ", "."),
                   "password": f"pw-{rng.randrange(1 << 30):08x}"}
            prod = {"id": i, "name": _name(rng), "description": _text(rng),
                    "price": float(rng.randint(1, 100))}
            users.append(self._env(None, usr, "c", ts))
            products.append(self._env(None, prod, "c", ts))
            state_u[i], state_p[i] = usr, prod

            # ~10% immediate update of username/name (data-generator.py:55-64)
            if rng.randint(1, 100) >= 90:
                new_u = dict(usr, username=_name(rng).replace(" ", "."))
                new_p = dict(prod, name=_name(rng))
                users.append(self._env(usr, new_u, "u", ts + 100))
                products.append(self._env(prod, new_p, "u", ts + 100))
                state_u[i], state_p[i] = new_u, new_p

            # ~5% immediate delete of both rows (data-generator.py:67-70)
            if rng.randint(1, 100) >= 95:
                users.append(self._env(state_u.pop(i), None, "d", ts + 200))
                products.append(self._env(state_p.pop(i), None, "d", ts + 200))

        return products, users

    def products_df(self, spark: SparkSession, num_records: int = 1000,
                    snapshot_rows: int = 0) -> DataFrame:
        events, _ = self.generate(num_records, snapshot_rows)
        return spark.createDataFrame(events, envelope_schema(PRODUCT_FIELDS))

    def users_df(self, spark: SparkSession, num_records: int = 1000,
                 snapshot_rows: int = 0) -> DataFrame:
        _, events = self.generate(num_records, snapshot_rows)
        return spark.createDataFrame(events, envelope_schema(USER_FIELDS))
