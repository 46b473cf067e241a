import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]")
    parts = int(os.environ.get("SPARK_GRAFT_TEST_PARTITIONS", "8"))
    s = get_spark(master=master, app_name="tests", shuffle_partitions=parts)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---- slow-tier marking (round 15) ----------------------------------
#
# The driver-visible default run must finish well inside its verify
# window (round-14 verdict item 1: the 39-min full suite was cut off
# mid-run). The tiers below were drawn from a full --durations=0 run
# (2026-08-18, 1150 passed in 39m01s): whole files that are property
# fuzzes / multi-commit lifecycle integration / stream drains /
# training loops, plus individual tests >3 s in otherwise-fast files.
# Default tier ≈ 15 min, slow tier ≈ 24 min; nothing is deleted —
# `-m slow` runs the slow tier, `-m ""` runs everything. The oracle
# parity suite (the driver-replayed correctness gate) deliberately
# stays in the DEFAULT tier in full.

_SLOW_FILES = {
    "test_delta_stream.py",
    "test_gaussian_lsh.py",
    "test_iceberg_stream.py",
    "test_ivf_trained.py",
    "test_ivfpq.py",
    "test_ivm.py",
    "test_ivm_join.py",
    "test_property.py",
    "test_property_round4c.py",
    "test_property_round4d.py",
    "test_property_scd2.py",
    "test_skew_lsh.py",
    "test_stream_dedup_pipeline.py",
    "test_stream_pacing.py",
    "test_txn_bloom.py",
    "test_txn_model.py",
    "test_txn_stream.py",
}

#: nodeid prefixes (parametrize brackets stripped) — each measured
#: >3 s in the timing run above
_SLOW_TESTS = {
    "test_advanced.py::test_approx_count_distinct_error_bound",
    "test_ann_index.py::test_append_plan_reads_only_batch_and_centroid_store",
    "test_ann_index.py::test_incremental_equals_build_all_at_once",
    "test_ann_index.py::test_store_versions_one_commit_per_batch",
    "test_bm25_index.py::TestBM25Index::test_batched_index_equals_one_shot",
    "test_bm25_index.py::TestBM25Index::test_compact_merges_segments_same_answer",
    "test_bm25_index.py::TestExactlyOnceEnforcement::test_bare_ingest_crash_window_detected_and_recovered",
    "test_bm25_index.py::TestExactlyOnceEnforcement::test_epoch_replay_noops_and_scores_match_one_shot",
    "test_bm25_index.py::TestExactlyOnceEnforcement::test_partial_crash_replay_completes",
    "test_bm25_index.py::TestScanBounds::test_foreign_commit_reseeds_and_scores_stay_exact",
    "test_bucket_mm3.py::TestHashPins::test_byte_class_column_algebra_equals_reference",
    "test_bucket_mm3.py::TestHashPins::test_string_bucket_write_prune_export",
    "test_cdc_apply.py::TestApplyChanges::test_incremental_windows_compose",
    "test_cdc_apply.py::TestApplyChanges::test_replaying_own_feed_reproduces_state",
    "test_cdc_apply.py::TestIcebergCdcStreamApply::test_stream_foreachbatch_apply_converges",
    "test_cdc_apply.py::TestPairChangelogUpdates::test_apply_agrees_with_raw_feed",
    "test_cdc_apply.py::TestPairingFoldInvariance::test_random_feeds_fold_identically",
    "test_cdc_apply.py::TestScd2ApplyChanges::test_incremental_windows_and_replay",
    "test_cdc_apply.py::TestScd2ApplyChanges::test_snapshot_at_equals_source_time_travel",
    "test_cdc_apply.py::TestScd2StreamingApply::test_cdc_stream_foreachbatch_scd2",
    "test_cdc_apply.py::TestStreamingApply::test_cdc_stream_foreachbatch_apply",
    "test_classifier.py::test_trained_model_separates",
    "test_clustering_search.py::test_bm25_duplicate_query_terms_do_not_double_count",
    "test_dedup_cluster.py::test_long_path_converges_and_singletons_fill",
    "test_dedup_fast_hash.py::test_fast_hash_pairs_equal_md5_pairs",
    "test_delta_cdf.py::TestCdcActions::test_cdc_actions_are_authoritative",
    "test_delta_cdf.py::TestChangeDataWrite::test_cdc_stream_consumes_written_change_data",
    "test_delta_cdf.py::TestMappedCdf::test_name_mapped_table_reads_logical_changes",
    "test_delta_cdf.py::TestMirrorParity::test_matches_txn_change_feed",
    "test_delta_cdf.py::TestReviewFixes::test_folded_commit_suppresses_cdc",
    "test_delta_dv.py::test_dv_past_driver_bound_decodes_on_executors",
    "test_delta_dv.py::test_read_delta_applies_inline_and_file_dvs",
    "test_delta_interop.py::TestColumnMapping::test_name_mapping_reads_logical",
    "test_delta_interop.py::TestMirrorExport::test_streaming_trigger_drives_continuous_mirror",
    "test_delta_interop.py::TestV2CheckpointWriting::test_classic_to_v2_transition_and_streams",
    "test_delta_interop.py::test_reader_matches_replay_model",
    "test_delta_interop.py::test_reader_refuses_column_mapping_and_unknown_features",
    "test_delta_interop.py::test_reader_replays_from_multipart_checkpoint",
    "test_delta_interop.py::test_reader_replays_from_parquet_checkpoint",
    "test_delta_interop.py::test_reader_replays_handwritten_multi_commit_log",
    "test_delta_row_tracking.py::TestRowTrackingMirror::test_assignment_one_way_and_domain",
    "test_delta_row_tracking.py::TestRowTrackingMirror::test_cow_rewrite_refuses",
    "test_delta_row_tracking.py::TestRowTrackingMirror::test_mid_mirror_enablement_backfill_and_checkpoint",
    "test_delta_row_tracking.py::TestRowTrackingMirror::test_stable_across_dv_delete_and_readd",
    "test_failure_semantics.py::test_merge_abort_during_staging_leaves_table_intact",
    "test_iceberg_interop.py::TestEqualityDeleteWrite::test_roundtrip_matches_txn_state",
    "test_iceberg_interop.py::TestEqualityDeleteWrite::test_style_switch_regenerates_not_carries",
    "test_iceberg_interop.py::TestLineageRewriteGate::test_plain_compact_refuses_under_v3",
    "test_iceberg_interop.py::TestRowLineage::test_assignment_and_metadata_fields",
    "test_iceberg_interop.py::TestRowLineage::test_compact_preserves_lineage_and_stays_invisible",
    "test_iceberg_interop.py::TestRowLineage::test_lineage_survives_dv_delete",
    "test_iceberg_interop.py::TestRowLineage::test_refusals",
    "test_iceberg_interop.py::TestRowLineage::test_v2_history_upgrade_reads_null_lineage",
    "test_incremental_store.py::test_concurrent_batch_during_signing_is_not_reemitted",
    "test_incremental_store.py::test_incremental_pairs_match_full_recompute",
    "test_incremental_store.py::test_steady_state_entry_is_result_idempotent_across_runs",
    "test_incremental_store.py::test_successive_batches_compose_through_the_store",
    "test_lake.py::test_publish_path_is_manifest_committed_and_pruned",
    "test_lake_extended.py::test_retrieve_by_urls",
    "test_multimodal.py::test_decode_meta",
    "test_partition_transforms.py::TestHiddenPartitioning::test_bucket_point_lookup_prunes_and_matches",
    "test_partition_transforms.py::TestHiddenPartitioning::test_identity_transform_over_timestamp_source",
    "test_partition_transforms.py::TestHiddenPartitioning::test_months_years_hours_transforms_prune",
    "test_partition_transforms.py::TestHiddenPartitioning::test_raw_range_predicate_prunes_through_days",
    "test_plans.py::test_tpch_analogs_are_not_vacuous",
    "test_pq.py::TestRecall::test_pipeline_recall_floor_and_lever",
    "test_round4_new_ops.py::test_semantic_dedup_planted_pairs",
    "test_round4c_ops.py::TestContainmentPairs::test_boilerplate_capped_before_join",
    "test_round4c_ops.py::TestContainmentPairs::test_planted_quote_caught_by_containment_not_jaccard",
    "test_round4c_ops.py::TestContainmentPairs::test_xxhash64_path_identical_pairs",
    "test_round4c_ops.py::TestPhraseSearch::test_empty_phrase_short_circuits",
    "test_scd2.py::test_change_closes_old_version",
    "test_scd2.py::test_mixed_batch_single_atomic_commit",
    "test_scd2.py::test_noop_batch_writes_no_commit",
    "test_scd2.py::test_null_transitions_are_null_safe",
    "test_scd2.py::test_snapshot_at_reads_history_point_in_time",
    "test_sources_sinks.py::test_overwrite_partition_touches_one_tenant",
    "test_stateful.py::test_stateful_running_stats_matches_batch",
    "test_streaming.py::test_stream_stream_interval_join_matches_batch",
    "test_streaming.py::test_stream_stream_left_outer_join_emits_unmatched",
    "test_txn.py::test_checkpoint_bounds_log_replay",
    "test_txn.py::test_clustered_compact_enables_data_skipping",
    "test_txn.py::test_delete_carries_untouched_files_by_reference",
    "test_txn.py::test_footer_stats_equivalent_to_agg",
    "test_txn.py::test_footer_stats_fallback_types_still_pruned",
    "test_txn.py::test_footer_stats_property_random_frames",
    "test_txn.py::test_merge_file_pruning_carries_untouched_files",
    "test_txn.py::test_read_changes_feed",
    "test_txn.py::test_read_key_range_prunes_files",
    "test_txn.py::test_stats_readback_toggle_serialized_across_writers",
    "test_txn.py::test_streaming_foreach_batch_sink",
    "test_txn.py::test_typed_stats_columns_survive_commit_and_prune",
    "test_txn.py::test_zorder_compact_prunes_on_both_dims",
    "test_txn.py::test_zorder_non_bmp_strings_roundtrip",
    "test_txn_merge_sync.py::TestMergeSync::test_untouched_files_carry_by_reference",
    "test_txn_rebase.py::test_rebase_refuses_over_unscoped_intervening_merge",
    "test_uniform_dual_export.py::test_dual_export_readers_and_feeds_agree",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        base = item.nodeid.split("[")[0]
        base = base.split("/")[-1] if "::" in base else base
        if fname in _SLOW_FILES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
