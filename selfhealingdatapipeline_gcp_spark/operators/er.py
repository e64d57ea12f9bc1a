"""Entity resolution / record linkage: typo-tolerant matching of
ID-like string keys (serial numbers, account names, SKUs) via
per-position masking + edit-distance verify.

The reference pipeline reconciles records across feeds by exact keys
(/root/reference/scripts/transform_script join keys;
/root/reference/monitoring/detectors/reconciliation_detector.py);
this module adds the fuzzy counterpart a real ingest needs when the
SAME entity arrives with a typo'd key. Design is pigeonhole
blocking, the discipline already proven by dedup_simhash /
multimodal_ahash_pairs: for edit distance ≤ 1 (substitution), mask
each of the last ``window`` positions in turn — two keys that differ
by one substitution inside the masked region share the key with THAT
position masked, so recall is exact for the covered region, and a
block's members pairwise differ only at the masked position, so
block size is bounded by the alphabet at that position (loud cap
beyond). Pair generation is bucket-grouped — no self-join node, one
corpus Exchange — the same shape the sf1 scaling runs forced on the
LSH path (operators/dedup.py:440-468).

Scale: keys explode ``window``× (window is 2-4), blocks carry only
(id, name) structs, pairs ≈ true matches (sharp blocks), and the
verify is JVM-side ``levenshtein`` on already-paired rows. No stage
is quadratic in the corpus; the quadratic danger (a flood of
identical names) hits the loud cap with a collapse-first remedy."""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.operators import dedup

_log = logging.getLogger(__name__)

#: marker for a masked position — outside every real key alphabet
_MASK = "\x01"


def _masked_keys(recs: DataFrame, window: int,
                 carry: tuple[str, ...] = ()) -> DataFrame:
    """(id, name, *carry, p, k): for p = 1..window (position from the
    END), k = name with that position replaced by the mask marker.
    Keys keep full length, so equal keys ⟹ equal name lengths ⟹ the
    pair differs ONLY at the masked position (edit distance ≤ 1).
    ``carry`` rides extra doc-level columns through the explode."""
    masks = F.array(*[
        F.concat(
            F.substring(F.col("name"), F.lit(1), F.length("name") - p),
            F.lit(_MASK),
            F.substring(F.col("name"),
                        F.length("name") - p + 2, F.lit(p - 1)),
        )
        for p in range(1, window + 1)
    ])
    return (
        recs.select("id", "name", *carry,
                    F.posexplode(masks).alias("pos", "k"))
        .filter(F.length("name") > F.col("pos") + 1)
        .select("id", "name", *carry,
                (F.col("pos") + 1).cast("int").alias("p"), "k")
    )


def er_name_pairs(customer: DataFrame, window: int = 4,
                  max_block: int = 256,
                  force_id_grain: bool = False) -> DataFrame:
    """Typo-linked id pairs over ``c_name``: both ids of every pair
    whose normalized names are equal up to ONE substitution in the
    last ``window`` positions (edit distance 0 means distinct ids
    carrying the SAME name — the strongest linkage signal).

    One corpus Exchange to blocks, in-bucket pair emission, one
    dedup Exchange across the ``window`` key families, then
    ``levenshtein`` verify on the paired rows only.

    Scale auto-fallback (VERDICT r7 #1): id-grain pair output grows
    QUADRATICALLY in identical-name mass (26.4M pairs at sf1, cap-
    refused at sf10). Before pairing, the measured block budget —
    the same max-block-size number ``er_blocking_report`` publishes —
    is checked with one cheap aggregate; above ``max_block`` the
    operator routes to KEEPER grain: identical names collapse to
    their min-id representative first (``er_name_links`` discipline),
    and pairs are emitted between keeper ids with the SAME output
    schema. The trade, stated plainly: keeper grain drops the
    within-identical-name-group edit-distance-0 pairs (dedup_exact /
    er_name_clusters territory) and one row stands for the whole
    n_ids_a × n_ids_b id-pair family (use ``er_name_links`` for the
    multiplicity accounting). ``force_id_grain=True`` restores the
    old loud per-block raise instead of falling back."""
    recs = customer.select(F.col("c_custkey").alias("id"),
                           F.lower(F.col("c_name")).alias("name"))
    masked = _masked_keys(recs, window)
    if not force_id_grain:
        budget = (masked.groupBy("p", "k")
                  .agg(F.count(F.lit(1)).alias("sz"))
                  .agg(F.max("sz")).first()[0]) or 0
        if budget > max_block:
            _log.warning(
                "er_name_pairs: largest block holds %d records "
                "(> max_block=%d) — auto-routing to keeper grain "
                "(identical names collapsed to min-id representative; "
                "pass force_id_grain=True for the strict id-grain "
                "form, er_name_links for multiplicity accounting)",
                budget, max_block)
            names = (
                recs.groupBy("name")
                .agg(F.min("id").alias("id"))
                .select("id", "name")
            )
            # distinct-name grain: block occupancy is alphabet-bounded
            # (the masking design's real promise) — 4096 matches the
            # er_name_links cap that gates green at sf10; a caller
            # who budgeted HIGHER than that keeps their budget
            return pairs_from_masked(
                _masked_keys(names, window),
                max_block=max(4096, max_block),
                op_name="er_name_pairs[keeper-grain]",
                distinct_names=True)
    return pairs_from_masked(masked, max_block)


def pairs_from_masked(masked: DataFrame,
                      max_block: int = 256,
                      op_name: str = "er_name_pairs",
                      distinct_names: bool = False,
                      carry: tuple[str, ...] = (),
                      ordered: bool = True) -> DataFrame:
    """Block-group-verify over an already-masked (id, name, p, k)
    relation — the shared core of er_name_pairs (batch) and
    streaming_er_guard (per-epoch masking, pairing over the
    accumulated key store). Masking is per-row, so the relation is
    chop-invariant by construction; everything downstream of it is
    one deterministic plan.

    ``op_name`` labels the overflow raise: the DISTINCT-NAME-grain
    callers (er_name_links, the keeper-grain fallback) must not emit
    the id-grain message, whose healer remedy — "drop force_id_grain
    so er_name_pairs auto-routes to keeper grain" — is circular when
    the failure already happened AT keeper grain.

    ``distinct_names=True`` (optimization r10, guide §2.4) declares
    the caller's guarantee that no two rows of ``masked`` share a
    name. Then every emitted pair joins two DISTINCT equal-length
    names differing at exactly one position — the masked position —
    so the pair surfaces in exactly ONE (p, k) family and the
    cross-family ``dropDuplicates`` Exchange is provably a no-op and
    is skipped. (At id grain, same-name pairs share ALL ``window``
    masked keys and the dedup is load-bearing — the default keeps
    it.)

    ``carry`` rides extra per-row columns of ``masked`` (e.g. the
    group multiplicity ``n_ids``) through the block structs and out
    as ``<col>_a`` / ``<col>_b`` — so callers never join the pair
    relation back to the record table (guide §2.4: two operations
    keyed the same way should share one pass). Struct field order
    keeps ``id`` first, so ``sort_array`` ordering — and therefore
    every emitted pair — is unchanged by carried columns.

    ``ordered=False`` skips the cosmetic global sort of the pair
    output (guide §2.4: "an orderBy used only to make output
    deterministic" is a removable Exchange). The driver's value hash
    is row-order-insensitive (rows are sorted before hashing on both
    engines), so the result multiset — the declared contract — is
    unchanged; measured on er_name_links, the sort's
    range-partitioning sample pass additionally re-evaluated the
    whole explode+levenshtein subtree a second time once the
    pair-dedup Exchange no longer sat between them as a
    materialization barrier."""
    if op_name == "er_name_pairs":
        remedy = (" — a flood of identical names makes in-block"
                  " pairing quadratic; collapse exact-duplicate names"
                  " to one representative first, or raise max_block")
    else:
        remedy = (" at distinct-name grain — the exact-duplicate"
                  " flood is already collapsed, so this block is"
                  " genuinely that many DISTINCT near-identical"
                  " names; shrink the masking window or raise"
                  " max_block deliberately")
    overflow = F.concat(
        F.lit(f"{op_name}: block holds "),
        F.size("mem").cast("string"),
        F.lit(f" records (> max_block={max_block})" + remedy))
    blocks = (
        masked
        .groupBy("p", "k")
        .agg(F.sort_array(F.collect_list(
                F.struct("id", "name", *carry)))
              .alias("mem"))
        .filter(F.size("mem") >= 2)
        .filter(F.when(F.size("mem") > max_block,
                       F.raise_error(overflow))
                 .otherwise(F.lit(True)))
    )
    pairs = (
        blocks
        .select(F.explode("mem").alias("a"), "mem")
        .select(F.col("a.id").alias("id_a"),
                F.col("a.name").alias("name_a"),
                *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
                F.explode(F.filter(
                    "mem", lambda m: m["id"] > F.col("a.id")))
                 .alias("b"))
        .select("id_a", "name_a",
                *[f"{c}_a" for c in carry],
                F.col("b.id").alias("id_b"),
                F.col("b.name").alias("name_b"),
                *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry])
    )
    if not distinct_names:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    pairs = (
        pairs
        .withColumn("edit_distance",
                    F.levenshtein("name_a", "name_b").cast("int"))
        # masked-key equality already implies ≤ 1; the filter is the
        # verify discipline (blocking recall ≠ precision contract)
        .filter(F.col("edit_distance") <= 1)
    )
    out = pairs.select("id_a", "id_b", "name_a", "name_b",
                       *[f"{c}_a" for c in carry],
                       *[f"{c}_b" for c in carry],
                       "edit_distance")
    return out.orderBy("id_a", "id_b") if ordered else out


def er_blocking_report(customer: DataFrame,
                       window: int = 4) -> DataFrame:
    """Blocking-quality audit, one row per masked position: how many
    non-trivial blocks each key family produces, the largest block,
    and the candidate-pair budget Σ C(size, 2) — the number a
    deployment watches to catch a quadratic blow-up BEFORE running
    the pair stage (the same role lsh_precision_report plays for the
    MinHash bands)."""
    recs = customer.select(F.col("c_custkey").alias("id"),
                           F.lower(F.col("c_name")).alias("name"))
    return (
        _masked_keys(recs, window)
        .groupBy("p", "k")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") >= 2)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_blocks"),
             F.max("sz").alias("max_block_size"),
             F.sum(F.expr("sz * (sz - 1) DIV 2"))
              .alias("n_candidate_pairs"))
        .select("p",
                F.col("n_blocks").cast("bigint").alias("n_blocks"),
                F.col("max_block_size").cast("bigint")
                 .alias("max_block_size"),
                F.col("n_candidate_pairs").cast("bigint")
                 .alias("n_candidate_pairs"))
        .orderBy("p")
    )


def er_name_clusters(customer: DataFrame, window: int = 2,
                     max_iterations: int = 25) -> DataFrame:
    """Transitive typo-clusters: connected components over the
    er_name_pairs edge relation — records reachable through chains
    of single-substitution links resolve to ONE entity with the min
    id as keeper (what a linkage pipeline actually merges on).

    Reuses the pointer-doubling component_labels core
    (operators/dedup.py:948): O(log diameter) rounds. Since the
    er_name_links scale measurement (26.4M id-pairs at sf1 — id-pair
    edges grow ~SF² with identical-name mass) the CC runs at
    DISTINCT-NAME grain: edges are keeper-to-keeper typo links from
    er_name_links, identical-name groups ride each name's n_ids, and
    dup-names with no typo link enter as singleton components — the
    id-grain output (min-id keeper, id-count sizes, clusters > 1) is
    IDENTICAL, the edge relation is linear in distinct names. Default
    window=2 keeps components alphabet-bounded so the oracle's
    transitive closure stays linear in the corpus."""
    names = (
        customer.select(F.lower(F.col("c_name")).alias("name"),
                        F.col("c_custkey").alias("ck"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ids"),
             F.min("ck").alias("keeper_id"))
    )
    links = er_name_links(customer, window=window)
    edges = links.select(F.col("keeper_id_a").alias("doc_a"),
                         F.col("keeper_id_b").alias("doc_b"))
    labels = dedup.component_labels(edges, max_iterations)
    # every name keyed by its component label; unlinked names label
    # themselves (their dup group is a component iff n_ids > 1)
    named = (
        names.join(labels.withColumnRenamed("doc_id", "keeper_id"),
                   "keeper_id", "left")
        .select(F.coalesce("label", "keeper_id").alias("label"),
                "n_ids", "keeper_id")
    )
    return (
        named.groupBy("label")
        .agg(F.sum("n_ids").cast("bigint").alias("cluster_size"),
             F.min("keeper_id").alias("keeper_id"))
        .filter(F.col("cluster_size") > 1)
        .select(F.col("label").alias("cluster_id"),
                "cluster_size", "keeper_id")
        .orderBy("cluster_id")
    )


def er_name_links(customer: DataFrame, window: int = 4,
                  max_block: int = 4096) -> DataFrame:
    """The SCALE form of er_name_pairs: collapse exact-duplicate
    names to ONE representative BEFORE blocking, pair DISTINCT names,
    and report each typo link with both groups' sizes and the implied
    id-pair multiplicity — instead of materializing every id×id
    combination inside identical-name groups.

    Why this form exists (measured): at sf1 er_name_pairs emits
    26.4M id-pairs from 150k customers because identical-name group
    sizes grow with the corpus, so id-pair output grows QUADRATICALLY
    in SF and the block cap trips at sf10 — the same degenerate-mass
    failure multimodal_ahash_pairs hit, fixed the same way (collapse
    to distinct signatures, pair the distinct relation, carry
    multiplicities). Block occupancy is bounded by DISTINCT names —
    the alphabet bound the masking design actually promises — and
    output is one row per distinct-name link at ANY scale. Exact-name
    duplicate mass itself is er_name_clusters / dedup territory; the
    implied_id_pairs column preserves the accounting.

    Plan shape (tightened in the r10 optimization round, guide §2.4):
    one name-grain collapse (shuffle carries names + counts), masked
    keys over the distinct-name relation WITH ``n_ids`` carried
    through the block structs, the same bucket-grouped pairing (no
    self-join node), levenshtein verify on paired rows. Every pair
    here has edit_distance exactly 1 (distinct names with equal
    full-length masked keys differ at precisely the masked position),
    and — distinct names — every pair surfaces in exactly one mask
    family, so the cross-family pair-dedup Exchange, the two
    name-relation joins that previously re-attached n_ids, AND the
    trailing cosmetic global sorts are gone (6 Exchange + 2 BHJ down
    to 2 Exchange; result multiset identical, pinned by the
    oracle)."""
    names = (
        customer.select(F.lower(F.col("c_name")).alias("name"),
                        F.col("c_custkey").alias("ck"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ids"),
             F.min("ck").alias("keeper_id"))
    )
    # reuse the masking on the distinct-name relation: id := keeper
    masked = _masked_keys(
        names.select(F.col("keeper_id").alias("id"), "name", "n_ids"),
        window, carry=("n_ids",))
    pairs = pairs_from_masked(masked, max_block,
                              op_name="er_name_links",
                              distinct_names=True, carry=("n_ids",),
                              ordered=False)
    # no trailing global sort: the output is corpus-sized (one row
    # per typo link) and the declared contract is the row multiset —
    # the driver hash sorts rows on both engines before comparing
    return (
        pairs.select(
            "name_a", "name_b",
            F.col("id_a").alias("keeper_id_a"),
            F.col("id_b").alias("keeper_id_b"),
            "n_ids_a", "n_ids_b",
            (F.col("n_ids_a") * F.col("n_ids_b")).cast("bigint")
             .alias("implied_id_pairs"),
            "edit_distance")
    )
