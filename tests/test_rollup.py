"""Continuous aggregate: incremental refresh must rescan only changed
date partitions and stay equal to a from-scratch recompute through
writes, LWW overwrites, and range deletes."""

import os

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.rollup import ContinuousRollup

DAY_NS = 86_400_000_000_000
DAY_MS = 86_400_000


class TestContinuousRollup:
    def test_incremental_refresh_lifecycle(self, spark, tmp_path):
        dbs = SerieslyDB(spark, str(tmp_path / "dbs"))
        dbs.create("m")
        dbs.write_batch(
            "m",
            [(1 * DAY_NS + i * 1_000_000_000, '{"k": %d}' % i) for i in range(10)]
            + [(2 * DAY_NS + i * 1_000_000_000, '{"k": %d}' % (100 + i)) for i in range(5)],
        )
        cr = ContinuousRollup(dbs, "m", str(tmp_path / "ru"), DAY_MS, "/k")

        assert cr.refresh() == {"changed": 2, "removed": 0, "unchanged": 0}
        assert sorted(map(tuple, cr.read().collect())) == [
            (1 * DAY_MS, 10, 45.0),
            (2 * DAY_MS, 5, 510.0),
        ]

        # hot-day append touches one partition
        dbs.write_batch("m", [(2 * DAY_NS + 50_000_000_000, '{"k": 1000}')])
        assert cr.refresh() == {"changed": 1, "removed": 0, "unchanged": 1}
        assert (2 * DAY_MS, 6, 1510.0) in set(map(tuple, cr.read().collect()))

        # LWW overwrite of an old key re-aggregates only its day
        dbs.write_batch("m", [(1 * DAY_NS, '{"k": 999}')])
        assert cr.refresh() == {"changed": 1, "removed": 0, "unchanged": 1}
        assert (1 * DAY_MS, 10, 1044.0) in set(map(tuple, cr.read().collect()))

        # range delete drops the partition from db AND rollup
        dbs.delete_range("m", 1 * DAY_NS, 1 * DAY_NS + 9_500_000_000)
        assert cr.refresh() == {"changed": 0, "removed": 1, "unchanged": 1}
        assert sorted(map(tuple, cr.read().collect())) == [(2 * DAY_MS, 6, 1510.0)]

        # idempotent: nothing changed, nothing rescanned
        assert cr.refresh() == {"changed": 0, "removed": 0, "unchanged": 1}
