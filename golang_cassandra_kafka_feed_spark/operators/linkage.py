"""Blocked fuzzy record linkage — edit-distance matching at scale.

A corpus pipeline constantly reconciles DIRTY identifiers against a
clean registry: OCR'd author names, typo'd usernames, crawl metadata
with dropped characters.  All-pairs edit distance is O(N*M) and dead
on arrival at 100 TB; the standard scale technique (Fellegi-Sunter /
Dedoop-style *blocking*) is:

1. derive a cheap BLOCK KEY from each record that any true match is
   expected to preserve (here: a stable suffix/prefix of the name);
2. equi-join dirty x clean on the block key — a plain shuffle hash
   join, so each side shuffles ONCE and pair enumeration is confined
   to within-block candidates;
3. score candidates with the expensive metric (Levenshtein), keep
   pairs under the threshold, and pick the best match per dirty
   record deterministically.

The block key is the recall/cost dial: a k-character block bounds
candidates to records agreeing on those k characters.  Production
systems run multiple blocking passes with different keys and union
the candidates (documented, not needed for the mechanism proof here).

Spark-side scoring uses the threshold form ``levenshtein(l, r, k)``
which abandons a row as soon as the running distance exceeds ``k``
(returns -1) — the per-pair cost is O(k * min(len)) instead of
O(len^2), the difference between feasible and not when blocks are
wide.  Best-match selection is argmin-via-min(struct) with map-side
partials — never a window over the block (a hot block would ship to
one task; the q111 canonical-selection lesson).

Reference tie: the reference reconciles by exact-key existence
probe (internal/store/feed.go:14-28, probe-then-branch at :32-43);
this operator is the same contract when the dirty side cannot be
trusted to normalize to an exact key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def suffix_block_key(name: str | Column, k: int = 3) -> Column:
    """The last ``k`` characters of ``name`` — the default block key.
    Right for identifier-like names whose tails are the discriminative
    part and whose expected corruptions hit earlier positions (the
    common case for padded numeric ids, version strings, checksums).

    Names shorter than ``k`` block on the WHOLE string (review-found:
    the unguarded form leaned on Spark substring's pos<=0 edge
    semantics, giving inconsistent key widths for short names, so a
    dirty/clean pair of different short lengths could land in
    different blocks with no recall warning).  Note the residual,
    documented trade: a short name still cannot match a long name
    whose suffix it is — that is blocking's standard recall trade,
    recovered by a complementary pass (``prefix_block_key`` pads the
    same way) or the q129 recall audit."""
    n = F.col(name) if isinstance(name, str) else name
    return F.when(F.length(n) <= k, n).otherwise(
        F.substring(n, F.length(n) - (k - 1), F.lit(k))
    )


def prefix_block_key(name: str | Column, k: int = 4) -> Column:
    """The first ``k`` characters — the complementary pass: a
    corruption can hit the suffix OR the prefix, almost never both
    (two independent edits would already cost 2 of the distance
    budget), so the union of the two passes recovers what either
    alone misses."""
    n = F.col(name) if isinstance(name, str) else name
    return F.substring(n, F.lit(1), F.lit(k))


def blocked_fuzzy_matches(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "dirty_id",
    dirty_name: str = "dirty_name",
    clean_id: str = "id",
    clean_name: str = "name",
    block_key: Callable[[str], Column] = suffix_block_key,
    max_dist: int = 2,
    block_keys: list[Callable[[str], Column]] | None = None,
    max_block_width: int | None = 4096,
) -> DataFrame:
    """Best fuzzy match per dirty record against the clean registry:
    ``(dirty_id, dirty_name, match_id, match_name, dist)`` with
    ``dist <= max_dist``, ties broken by smallest (dist, match_id).
    Dirty records whose true match disagrees on the block key are
    unmatched (absent) — that is blocking's documented recall trade,
    dialed by the key choice, not a defect of the join.

    ``block_keys`` (optional) runs MULTI-PASS blocking: one equi-join
    per key, candidates unioned before scoring — the standard recall
    lever (a record corrupted inside one key is recovered by a pass
    whose key it preserves).  Each pass costs one shuffle of each
    side; a candidate surfacing in several passes is harmless — the
    final argmin is idempotent over duplicates.

    ``max_block_width`` caps the CLEAN side per block (smallest ids
    kept; rank-filter plans as WindowGroupLimit, map-side truncation —
    the dedup mega-bucket guard): pair enumeration within a block is
    |dirty| * |clean|, so one degenerate block key (an empty-name
    sentinel, a boilerplate default) would otherwise go quadratic on
    one task at corpus scale.  Like every cap in the dedup family it
    trades bounded recall for a bounded tail task; a block wider than
    the cap means the key is under-discriminating — refine the key
    rather than raising the cap.  ``None`` disables."""
    passes = block_keys if block_keys else [block_key]
    dist = F.levenshtein(F.col(dirty_name), F.col("__cname"), max_dist)
    scored = None
    for bk in passes:
        d = dirty.select(
            F.col(dirty_id),
            F.col(dirty_name),
            bk(dirty_name).alias("__blk"),
        )
        c = clean.select(
            F.col(clean_id).alias("__cid"),
            F.col(clean_name).alias("__cname"),
            bk(clean_name).alias("__blk"),
        )
        if max_block_width is not None:
            wcap = Window.partitionBy("__blk").orderBy("__cid")
            c = (
                c.withColumn("__rn", F.row_number().over(wcap))
                .filter(F.col("__rn") <= max_block_width)
                .drop("__rn")
            )
        cand = d.join(c, "__blk")
        scored = cand if scored is None else scored.unionByName(cand)
    scored = (
        scored.withColumn("__d", dist)
        .filter(F.col("__d") >= 0)  # -1 == threshold exceeded
    )
    best = F.min(
        F.struct(
            F.col("__d").alias("d"),
            F.col("__cid").alias("i"),
            F.col("__cname").alias("n"),
        )
    ).alias("b")
    return (
        scored.groupBy(dirty_id, dirty_name)
        .agg(best)
        .select(
            dirty_id,
            dirty_name,
            F.col("b.i").alias("match_id"),
            F.col("b.n").alias("match_name"),
            F.col("b.d").alias("dist"),
        )
    )
