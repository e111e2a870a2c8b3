"""Shared plan-shaping helpers for the operator library."""

from __future__ import annotations

import threading
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame


def round_half_up(x: float, ndigits: int = 6) -> float:
    """Round with SQL semantics (half away from zero), not Python's
    built-in ``round`` (half to even / banker's rounding). Python codec
    stages (mapInPandas image/audio/zlib operators) must round exactly
    like ``F.round``/DuckDB ``round`` or an exact tie at the last kept
    digit diverges from the oracle hash.

    Decimal sees the shortest-repr of the float (``str(x)``) — the same
    literal the SQL engines' double->decimal path rounds — so 2.5e-06
    ties round UP here exactly as they do there.
    """
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(str(x)).quantize(q, rounding=ROUND_HALF_UP))


_SCOPED_CACHE: dict[str, DataFrame] = {}
_SCOPED_CACHE_LOCK = threading.Lock()


def scoped_persist(df: DataFrame, scope: str, eager: bool = False) -> DataFrame:
    """``persist()`` with a per-operator lifecycle: caches the frame
    (eagerly via ``count()`` when the consumers race inside one action)
    and unpersists whatever the SAME scope cached on its previous
    invocation. A lazily-returned operator has no "after the final
    action" moment to unpersist in, so a bare ``persist()`` leaks its
    blocks for the life of the session — across a 50+-query gate run
    those add up. With this, steady-state cache usage is bounded at one
    live copy per operator scope. The only cost: a PRIOR invocation's
    still-uncollected result recomputes if driven after a newer call —
    slower, never wrong.

    Concurrency/lifetime hardening: the registry is guarded by a lock
    (two threads building the same scope must not interleave pop/insert
    and leak a persisted copy), and the eviction tolerates a cached
    frame whose SparkSession has since been stopped — ``unpersist`` on
    a dead session raises, but the entry is already unreachable, so the
    failure is swallowed and the new frame takes the slot.
    """
    with _SCOPED_CACHE_LOCK:
        prev = _SCOPED_CACHE.pop(scope, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # stale entry from a stopped SparkSession
    p = df.persist()
    if eager:
        p.count()
    with _SCOPED_CACHE_LOCK:
        stale = _SCOPED_CACHE.pop(scope, None)
        _SCOPED_CACHE[scope] = p
    if stale is not None and stale is not p:
        try:
            stale.unpersist(blocking=False)
        except Exception:
            pass
    return p


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    arrives in fewer partitions (e.g. one small parquet file) and the next
    stage does expensive per-row compute (hashing, signatures, projections).

    At real scale this is a no-op — a 100 TB scan already yields far more
    partitions than cores — but without it a compact input serializes an
    embarrassingly parallel stage onto one core. The round-robin shuffle it
    inserts moves only the raw rows, which is strictly cheaper than leaving
    (cores - 1) of the cluster idle through the compute stage.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


_ROTATOR_LOCK = threading.Lock()


class CheckpointRotator:
    """One-live-copy lifecycle for ``localCheckpoint`` loops.

    Iterative operators (BPE merge rounds, label propagation) must
    eagerly ``localCheckpoint`` each round to truncate lineage, but a
    checkpointed frame's blocks are NOT freed by ``DataFrame.
    unpersist()`` (checkpoints bypass the CacheManager — measured: the
    blocks stay in ``getPersistentRDDs`` after the call), so a K-round
    loop accumulates K+1 full copies of the loop state in the block
    manager. This helper tracks the checkpoint's underlying persistent
    RDD ids (the diff of ``getPersistentRDDs`` around the checkpoint,
    taken under a process-wide lock so two concurrent rotators can't
    claim each other's ids) and unpersists the PREVIOUS round's blocks
    once the new round's checkpoint has materialized — bounded at one
    live copy, the ``scoped_persist`` budget.
    """

    def __init__(self) -> None:
        self._ids: set[int] = set()
        self._pending: set[int] = set()

    @staticmethod
    def _persistent_ids(sc) -> set[int]:
        m = sc._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    @staticmethod
    def _checkpoint_ids(sc, ids: set[int]) -> set[int]:
        """Restrict ``ids`` to locally-checkpointed RDDs. The
        restriction is what makes the around-the-call diff in
        :meth:`checkpoint` SAFE: materializing a checkpoint also
        materializes any lazily ``persist()``-ed frame its plan reads
        (scoped_persist loop invariants — shingle tables, edge
        lists), whose cache RDD ids would otherwise appear in the
        diff and be freed as if they were a superseded round —
        measured as the per-iteration re-explosion of the whole
        shingle table in pagerank/hits (every round paid the corpus
        scan again). A checkpoint's own blocks answer
        ``isLocallyCheckpointed``; CacheManager entries never do.
        Only the (few) DIFF ids are probed — a py4j round-trip per
        persistent RDD per round measurably dragged the many-round
        BPE loops."""
        if not ids:
            return ids
        m = sc._jsc.getPersistentRDDs()
        out = set()
        for k in list(m.keySet().toArray()):
            ki = int(k)
            if ki not in ids:
                continue
            try:
                if m.get(k).rdd().isLocallyCheckpointed():
                    out.add(ki)
            except Exception:
                pass
        return out

    @staticmethod
    def _unpersist(sc, ids: set[int]) -> None:
        if not ids:
            return
        try:
            m = sc._jsc.getPersistentRDDs()
            for k in list(m.keySet().toArray()):
                if int(k) in ids:
                    m.get(k).unpersist(False)
        except Exception:
            pass  # freeing is best-effort (e.g. session already stopped)

    def checkpoint(
        self, df: DataFrame, eager: bool = True, defer_free: bool = False
    ) -> DataFrame:
        """Checkpoint ``df`` and free superseded rounds.

        ``eager=True`` (default): materialize now and free everything
        older — the new frame no longer references it.

        ``eager=False``: register the checkpoint WITHOUT spending a
        driver job; the next action over the returned frame
        materializes it (localCheckpoint persists its RDD at call
        time, so the block ids are trackable immediately). Freeing is
        deferred one generation: the PREVIOUS round's blocks stay live
        because the new frame's lineage still reads them until it
        materializes. CONTRACT: a lazy checkpoint may only be taken
        after the previous one has materialized (run an action in
        between) — the rotator frees two-generations-back on that
        assumption.

        ``defer_free=True`` (with eager=True): materialize now but
        keep the PREVIOUS generation's blocks one round longer — for
        loops where an un-checkpointed LAZY sibling of the new frame
        (e.g. hits' authority half-step) still reads the previous
        checkpoint and would hit truncated lineage if it were freed."""
        sc = df.sparkSession.sparkContext
        with _ROTATOR_LOCK:
            before = self._persistent_ids(sc)
            cp = df.localCheckpoint(eager=eager)
            new_ids = self._checkpoint_ids(
                sc, self._persistent_ids(sc) - before
            )
        if eager and not defer_free:
            prev = self._pending | self._ids
            self._pending = set()
            self._ids = new_ids
            self._unpersist(sc, prev)
        else:
            prev, self._pending = self._pending, self._ids
            self._ids = new_ids
            self._unpersist(sc, prev)
        return cp

    def close(self, sc) -> None:
        """Free the final round's blocks once the loop's RESULT no
        longer depends on them (e.g. after it was collected)."""
        ids = self._pending | self._ids
        self._pending, self._ids = set(), set()
        self._unpersist(sc, ids)
