"""Session-scoped plan memoization: ``memo_checkpoint``.

Several registered queries share an expensive SMALL-OUTPUT subtree —
the canonical case is the ANN recall reports: ``ann_recall`` (IVF tier)
and ``ann_recall_pq`` (PQ tier) both audit against the SAME exact
brute-force ranking, and ``ann_recall_pq`` additionally re-derives the
PQ code table that ``pq_ann`` already computed.  Spark has no
cross-action common-subtree reuse: every action re-executes its whole
plan, so an eval suite that runs the ladder rungs back-to-back pays the
exact-ranking corpus scan once per rung.

``memo_checkpoint(df)`` is the in-session analog of persisting an index
table (see ``write_ivf_index`` for the durable tier): the first caller
``localCheckpoint``s the frame (materializing it to executor-local
blocks, truncating lineage); later callers with a SEMANTICALLY
IDENTICAL plan get the already-materialized frame back.  Keying:

- ``DataFrame.semanticHash()`` — a hash of the canonicalized analyzed
  plan, so the same operator composition over the same source paths
  hits regardless of which query built it.
- the SparkContext ``applicationId`` — a restarted session invalidates
  every entry (checkpoint blocks die with their context).

Use it for frames that are small relative to the corpus (top-k
rankings, code tables, broadcast-sized LUTs): checkpoint blocks live in
executor storage memory until the session ends.  At 100 TB the same
decision becomes "persist the index to parquet once per rebuild" —
this memo is the single-session rehearsal of that pattern.

THREE entries are deliberately corpus-PROPORTIONAL — the IVF cell
assignment (``similarity.ivf_cells``), the LSH bucket table
(``similarity.bucketed_corpus``), and, through the sibling
``multimodal.session_cached_relation`` mechanism, the hashed-shingle
relation (``queries_registry._doc_shingles``).  Each one IS an index a
100 TB deployment writes to parquet once per corpus rebuild and every
retrieval/dedup face reads (``write_ivf_index`` is the durable tier of
the same relation); memoizing them in-session is the rehearsal of that
read path, accepted with open eyes:

- Measured footprint at the sf1 blow-up (50k docs / 20k vectors;
  ``tools/MEMO_FOOTPRINT_SF1.json``): shingles 27.0 MB (1.37x the raw
  text column), IVF cells 7.6 MB, LSH buckets 7.5 MB — linear in the
  corpus, and the full resident set across ALL session caches at
  sf0.1 is 7.4 MB (``tools/CACHE_PRESSURE_AB.json``, where a
  controlled resident-vs-cleared A/B also ruled out eviction pressure
  on unrelated queries, median ratio 1.04).
- Both storage levels spill (CACHE TABLE and localCheckpoint default
  MEMORY_AND_DISK), so growth degrades to disk reads, not OOM.
- ``localCheckpoint`` blocks are NON-RELIABLE: an executor loss kills
  them and the job (acceptable in local mode / single-session bench;
  the at-scale answer is the persisted parquet index, not a bigger
  cache).
- ``memo_checkpoint`` is EAGER: the first call materializes the frame
  at plan-construction time, so building a plan without executing it
  still pays the scan (callers that need construction-time laziness
  must opt out).

Staleness contract: entries assume source data is immutable for the
life of the session (true for the driver's read-only parquet inputs).
``memo_clear()`` resets, for tests that rewrite their temp inputs.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import DataFrame

_MEMO: Dict[Tuple[str, int], DataFrame] = {}

# Observability for tests: how many calls were served from the memo.
HITS = 0


def memo_checkpoint(df: DataFrame) -> DataFrame:
    """Return a ``localCheckpoint`` of ``df``, reusing a prior
    checkpoint when a semantically identical plan was already
    materialized in this Spark application."""
    global HITS
    try:
        key = (df.sparkSession.sparkContext.applicationId, df.semanticHash())
    except Exception:
        # No context / analysis failure: fall back to a plain eager
        # checkpoint so callers never see a behavior difference.
        return df.localCheckpoint()
    hit = _MEMO.get(key)
    if hit is not None:
        HITS += 1
        return hit
    ck = df.localCheckpoint()
    _MEMO[key] = ck
    return ck


def memo_clear() -> None:
    """Drop all memo entries (tests that mutate their inputs)."""
    _MEMO.clear()
