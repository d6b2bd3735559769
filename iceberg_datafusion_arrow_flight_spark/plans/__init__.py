"""Query-plan catalog.

The reference exposes its entire operator surface through one entry point —
``ctx.sql(user_query)`` at iceberg-datafusion-arrow-flight/src/lib.rs:678 —
so its capability contract is "the set of SQL shapes DataFusion 40
executes" (SURVEY §2).  This package re-expresses that contract as a
registry of named, declarative Spark plans: every SURVEY §2 row gets at
least one :class:`~.base.QuerySpec`, built with the DataFrame API (so
Catalyst owns physical strategy selection) and paired with an ANSI-SQL
oracle string for the DuckDB correctness gate.

Importing this package populates the registry.
"""

from .base import REGISTRY, QuerySpec, register, table

# Import for registration side effects.  Untested-in-round-1 families first
# so that, if the driver's correctness gate caps its run, the tail it skips
# is the already-driver-green TPC-H / relational block (CORRECTNESS_r01).
from . import aggregates      # noqa: E402,F401
from . import windows         # noqa: E402,F401
from . import scalar_funcs    # noqa: E402,F401
from . import nested          # noqa: E402,F401
from . import dedup           # noqa: E402,F401
from . import similarity      # noqa: E402,F401
from . import text            # noqa: E402,F401
from . import multimodal      # noqa: E402,F401
from . import events          # noqa: E402,F401
from . import graph_queries   # noqa: E402,F401
from . import dialect_queries # noqa: E402,F401
from . import ddl_io          # noqa: E402,F401
from . import iceberg_queries # noqa: E402,F401
from . import pipeline_queries # noqa: E402,F401
from . import streaming_queries # noqa: E402,F401
from . import service_queries # noqa: E402,F401
from . import relational      # noqa: E402,F401
from . import tpch            # noqa: E402,F401

# The driver's correctness gate checks exactly the FIRST 50 registry
# entries in insertion order; the explicit window below hand-picks them.
# Entries not listed keep their registration order after the window.
#
# Rotation ledger — CURRENT state only; the full r01-r06 rotation
# history was moved verbatim to PERFORMANCE.md ("Rotation ledger
# archive") at r7 open; r07's window composition is archived there too.
# Rotation state is always re-derivable from the CORRECTNESS_r0*.json
# keys (union = ever-checked; per-file = that round's window).
#
#   State at r07 close: registry 318; CORRECTNESS_r01-r07 union = 312
#   ever-checked (304 full-green, 8 rows-only by design with oracled
#   witnesses, 0 red).  The 6 never-checked entries (all added late r7)
#   form the r08 pool below.
#
#   r08 window (below) = that 6-entry pool + re-pins drawn from the
#   OLDEST never-re-checked driver-green entries (the last-checked-r01
#   relational/TPC-H block + agg_having_filter_distinct [r02]), with 26
#   of the re-pin slots ceded mid-round to entries NEW in r08 (each
#   two-scale local-gated on arrival; full ceded list in the NEW
#   section's comment; window re-swept 50/50 at sf0.01 after every
#   edit; round-close full-registry sweep 340/340).
#
#   State at r08 close: registry 357; CORRECTNESS_r01-r08 union = 342
#   ever-checked (334 full-green, 8 rows-only by design with oracled
#   witnesses, 0 red).  The 15 never-checked entries (all added late
#   r8) form the r09 pool below.
#
#   r09 window (below) = that 15-entry pool + re-pins drawn from the
#   OLDEST never-re-checked driver-green entries: the 23
#   last-checked-r01 entries (relational tail + the 13 TPC-H queries
#   ceded from the r08 window) followed by the oldest r02 block.
#   Entries NEW in r09 cede re-pin slots from the list TAIL
#   (youngest-staleness-first), exactly the r08 policy.
#
#   Window declared FULL after the 14th r09 addition (only the
#   protected window_range_frame re-pin remains beside the r01 block):
#   entries registered after that form the r10 never-checked pool
#   (each two-scale local-gated on arrival): join_asof_forward_tolerance,
#   pipeline_temperature_mixture, events_time_to_convert, func_bitwise,
#   stream_join_purchase_after_signup, text_tokenizer_fertility,
#   stream_stateful_running_totals, events_retention_day_n,
#   multimodal_png_decode, multimodal_pixel_dedup_cross_codec,
#   agg_grouping_id_bitmask, events_anomaly_hw_residual,
#   unnest_explode_outer, io_copy_compression_codecs,
#   events_error_rate_daily, sim_cosine_distance_histogram,
#   text_hapax_ratio_by_source, window_value_ignore_nulls,
#   sim_ann_recall_at_k_sweep, events_growth_accounting_weekly,
#   dedup_cluster_size_histogram, events_hourly_profile,
#   pipeline_length_percentiles_by_lang  (23-entry r10 pool).
#   They lead the r10 window together with re-pins from the oldest
#   never-re-checked block (the 23 r01 entries below, if their r9
#   re-pin is superseded, else the r02 cedes listed in the comments).
#   State at r09 close: registry 391; CORRECTNESS_r01-r09 union = 368
#   ever-checked (360 full-green, 8 rows-only by design with oracled
#   witnesses, 0 red).  The 23 never-checked entries (all added late
#   r9, each two-scale local-gated on arrival) form the r10 pool below.
#
#   r10 window (below) = that 23-entry pool + re-pins drawn from the
#   OLDEST never-re-checked driver-green block: the 36 last-checked-r02
#   entries, oldest-first in registration order.  Entries NEW in r10
#   cede re-pin slots from the list TAIL (youngest-staleness-first),
#   exactly the r08/r09 policy.
#
#   Staleness ledger projected at r10 close (latest driver check per
#   entry, assuming this window lands): r10=50, r9=50, r8=50, r7=50,
#   r6=48, r5=43, r4=45, r3=43, r2=19 — total 398.  The r11 re-pin
#   QUEUE is the entries still at r02/r03, in this order: the 9
#   r02 cedes from this round (func_regex, func_crypto_encoding,
#   func_trig, func_datetime, func_conditional, func_cast_trycast,
#   unnest_explode, json_access, table_func_generate_series), then
#   the 12 remaining r02 entries
#   (dedup_exact, dedup_ngram_jaccard, sim_embedding_near_dup,
#   text_token_counts, sketch_bloom_membership, join_asof_events,
#   ddl_ctas_insert_select, io_copy_to_roundtrip,
#   catalog_information_schema_tables, iceberg_time_travel,
#   pipeline_train_test_split, tpch_q12_priority_shipping), then the
#   43 r03 block in registration order (agg_array_collect first).
#   Full re-coverage of the r02-r04 tail needs ~3 more windows.
_PRIORITY: list[str] = [
    # ---- r11 window ----
    # All 404 entries are driver-checked (r10 closed the cumulative
    # pool at 404/404), so the r11 window is a pure staleness drain
    # plus rewrite re-pins.  Composition:
    #
    # --- rewrite re-pins (NOT cedeable): entries whose oracle or plan
    # changed this round and need a fresh driver pin (the r10
    # sim_ann_lsh_topk precedent): graph_hits_hubs_authorities (oracle
    # tie-break now ranks on the rounded key), sim_ann_ivfpq_residual_recall
    # (ivf_assign column pass-through replaced the two broadcast
    # re-joins), dedup_containment (PPJoin+ positional filter, VERDICT
    # r10 ask #3):
    "graph_hits_hubs_authorities", "sim_ann_ivfpq_residual_recall",
    "dedup_containment",
    # --- re-pins: the full 25-entry last-checked-r02 tail (oldest
    # staleness in the registry), in registration order:
    "window_agg_mixed_with_groupby", "window_groups_frame",
    "func_string_basic", "func_string_search", "func_regex",
    "func_crypto_encoding", "func_trig", "func_datetime",
    "func_conditional", "func_cast_trycast", "unnest_explode",
    "json_access", "table_func_generate_series",
    "dedup_exact", "dedup_ngram_jaccard", "sim_embedding_near_dup",
    "text_token_counts", "sketch_bloom_membership", "join_asof_events",
    "ddl_ctas_insert_select", "io_copy_to_roundtrip",
    "catalog_information_schema_tables", "iceberg_time_travel",
    "pipeline_train_test_split", "tpch_q12_priority_shipping",
    # --- re-pins: head of the 43-entry last-checked-r03 block in
    # registration order; entries NEW in r11 cede slots from THIS
    # list's TAIL (youngest-staleness-first, the r08-r10 policy).
    # Ceded so far (tail-first): sim_knn_confusion, sim_semantic_dedup
    # (for the two GIF entries), dedup_cross_corpus (for the finalized
    # outer stream join), dedup_prune_corpus, dedup_cluster_components,
    # sim_label_centroid_distance (for Katz / CDC chunking / Simpson
    # diversity), dedup_substring_overlap (for the logreg distiller),
    # dedup_token_jaccard_ppjoin (for the TIFF decode), dedup_simhash
    # (for the μ-law round-trip), dedup_exact_token_set (for the
    # cross-source BLEU), struct_access (for the AMS F2 sketch),
    # array_higher_order (for Burrows' Delta);
    # each ceded name re-queues at the head of the r12 re-pin queue:
    "agg_array_collect", "agg_bool_bit", "agg_exact_distinct",
    "agg_hdr_quantile_sketch", "agg_pivot_lang_by_source",
    "agg_equi_width_histogram", "window_named_clause", "func_math",
    "array_construct_access",
    # pulled forward from the r03 block (out of registration order) so
    # the multimodal family keeps a window row (family-coverage guard):
    "multimodal_resize_real",
    # --- NEW in r11 (two-scale local-gated on arrival):
    "multimodal_gif_decode", "multimodal_gif_animation_dedup",
    "stream_outer_join_finalized", "graph_katz_centrality",
    "dedup_cdc_chunking", "text_simpsons_diversity",
    "pipeline_quality_logreg_distill", "multimodal_tiff_decode",
    "multimodal_audio_mulaw_roundtrip", "text_cross_source_bleu",
    "sketch_ams_f2_calibration", "text_burrows_delta",
]


def _apply_priority() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # pragma: no cover - guarded by tests/test_registry_order.py
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_priority()

__all__ = ["REGISTRY", "QuerySpec", "register", "table"]
