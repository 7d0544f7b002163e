"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship: the full extraction pipeline over sf0.001 pages.
``queries``    — one entry per implemented operator (SURVEY.md §2 + the
                 training-data operator suite), each (spark, sf_dir) -> DF.
``oracle_sql`` — DuckDB-runnable ANSI SQL reconstructing each query's exact
                 output (column names aligned; floats rounded identically).

Every oracle here is a FULL value oracle — including the extraction
pipeline itself: the pages table is generated from the documents parquet
by deterministic formula (textextraction_spark/sources/pages.py), so DuckDB
can recompute the byte-exact expected extracted_text per url.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _tumbling_host_counts(spark, sf_dir):
    from textextraction_spark.streaming.windows import tumbling_host_counts

    return tumbling_host_counts(spark, sf_dir)


def _tumbling_oracle() -> str:
    from textextraction_spark.streaming.windows import tumbling_host_counts_oracle

    return tumbling_host_counts_oracle()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract main content + spans from the synthetic
    Common-Crawl-style pages table at sf0.001."""
    from pyspark.sql import functions as F

    from textextraction_spark.job.extract import extract_pages
    from textextraction_spark.sources.pages import build_pages

    pages = build_pages(spark, "/root/testdata/sf0.001")
    return extract_pages(pages).select(
        "url",
        "warc_ts",
        "extracted_text",
        "confidence",
        "n_lines",
        "is_pdf",
        F.size("spans").alias("n_spans"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from textextraction_spark.functions import analytics as A
    from textextraction_spark.functions import relational as R
    from textextraction_spark.operators import curation as C
    from textextraction_spark.operators import dedup as D
    from textextraction_spark.operators import multimodal as M
    from textextraction_spark.operators import scheduling as SCH
    from textextraction_spark.operators import simsearch as S
    from textextraction_spark.operators import templates as TP
    from textextraction_spark.operators import textstats as T
    from textextraction_spark.plans import queries as X

    return {
        # --- extraction pipeline (SURVEY.md §2.1-2.3, §2.8) ---
        "extract_html_text": X.extract_html_text,
        "extract_pdf_text": X.extract_pdf_text,
        "extract_confidence": X.extract_confidence,
        "extract_invoice_fields": X.extract_invoice_fields,
        "extract_medical_fields": X.extract_medical_fields,
        "extract_span_offsets": X.extract_span_offsets,
        "pdf_highlight_rects": X.pdf_highlight_rects,
        "audit_row": X.audit_row,
        "extract_phi_encrypted": X.extract_phi_encrypted,
        "host_distribution": X.host_distribution,
        "corpus_prep_pipeline": X.corpus_prep_pipeline,
        # --- text analysis ---
        "token_stats": T.token_stats,
        "quality_score": T.quality_score,
        "lang_id": T.lang_id,
        "fingerprint": T.fingerprint,
        "site_template_lines": TP.site_template_lines,
        "pii_scrub": C.pii_scrub,
        "gopher_repetition": C.gopher_repetition,
        "hash_sample": C.hash_sample,
        "curation_pipeline": C.curation_pipeline,
        # --- dedup ---
        "dedup_exact": D.exact_dedup,
        "dedup_ngram_jaccard": D.ngram_jaccard,
        "dedup_minhash_lsh": D.minhash_lsh,
        "dedup_simhash": D.simhash_pairs,
        "dedup_url_normalize": D.url_normalize_dedup,
        "dedup_incremental": D.incremental_dedup,
        "dedup_repeated_spans": D.span_dedup,
        # --- similarity search ---
        "ann_brute_force_topk": S.brute_force_topk,
        "ann_lsh_bucket": S.lsh_bucket_ann,
        "ann_lsh_multiprobe": S.lsh_multiprobe_ann,
        "ann_ivf_probe": S.ivf_probe_ann,
        "ann_ivf_multiprobe": S.ivf_multiprobe_ann,
        "embedding_near_dup": S.embedding_near_dup,
        # --- multimodal plumbing ---
        "media_metadata": M.media_metadata,
        "media_frame_sample": M.media_frame_sample,
        "media_decode_resize": M.media_decode_resize,
        "media_audio_features": M.media_audio_features,
        "politeness_schedule": SCH.politeness_schedule,
        "politeness_schedule_grouped": SCH.politeness_schedule_grouped,
        # --- relational operator suite (SURVEY.md §2.3-2.7) ---
        "p1_strip_special": R.p1_strip_special,
        "p3_keyword_gate": R.p3_keyword_gate,
        "a1_avg_by_group": R.a1_avg_by_group,
        "a2_first_event_per_user": R.a2_first_event_per_user,
        "a4_collect_per_group": R.a4_collect_per_group,
        "w1_topk_per_group": R.w1_topk_per_group,
        "j1_broadcast_join": R.j1_broadcast_join,
        "j2_anti_join_resume": R.j2_anti_join_resume,
        "j3_large_join_smj": R.j3_large_join_smj,
        "s1_top_orders": R.s1_top_orders,
        "set_except_types": R.set_except_types,
        "q1_pricing_summary": R.q1_pricing_summary,
        "f_json_extract": R.f_json_extract,
        # --- analytic suite (window frames, grouping sets, as-of/band joins) ---
        "w2_lag_moving_avg": A.w2_lag_moving_avg,
        "w4_ntile_rank": A.w4_ntile_rank,
        "rollup_daily_counts": A.rollup_daily_counts,
        "cube_type_bucket": A.cube_type_bucket,
        "asof_last_click": A.asof_last_click,
        "pivot_user_type_counts": A.pivot_user_type_counts,
        "pctl_value_by_type": A.pctl_value_by_type,
        "sessionize_batch": A.sessionize_batch,
        "w3_tumbling_host_counts": _tumbling_host_counts,
        "band_range_join": A.band_range_join,
        "intersect_types": A.intersect_types,
    }


def oracle_sql() -> dict[str, str]:
    from textextraction_spark.functions import analytics as A
    from textextraction_spark.functions import relational as R
    from textextraction_spark.operators import curation as C
    from textextraction_spark.operators import dedup as D
    from textextraction_spark.operators import multimodal as M
    from textextraction_spark.operators import scheduling as SCH
    from textextraction_spark.operators import simsearch as S
    from textextraction_spark.operators import templates as TP
    from textextraction_spark.operators import textstats as T
    from textextraction_spark.plans import queries as X

    return {
        "extract_html_text": X.extract_html_text_oracle(),
        "extract_pdf_text": X.extract_pdf_text_oracle(),
        "extract_confidence": X.extract_confidence_oracle(),
        "extract_invoice_fields": X.extract_invoice_fields_oracle(),
        "extract_medical_fields": X.extract_medical_fields_oracle(),
        "extract_span_offsets": X.extract_span_offsets_oracle(),
        "pdf_highlight_rects": X.pdf_highlight_rects_oracle(),
        "audit_row": X.audit_row_oracle(),
        "extract_phi_encrypted": X.extract_phi_encrypted_oracle(),
        "host_distribution": X.host_distribution_oracle(),
        "corpus_prep_pipeline": X.corpus_prep_pipeline_oracle(),
        "token_stats": T.TOKEN_STATS_ORACLE,
        "quality_score": T.QUALITY_ORACLE,
        "lang_id": T.LANG_ID_ORACLE,
        "fingerprint": T.FINGERPRINT_ORACLE,
        "site_template_lines": TP.SITE_TEMPLATE_ORACLE,
        "pii_scrub": C.PII_SCRUB_ORACLE,
        "gopher_repetition": C.GOPHER_REPETITION_ORACLE,
        "hash_sample": C.HASH_SAMPLE_ORACLE,
        "curation_pipeline": C.CURATION_PIPELINE_ORACLE,
        "dedup_exact": D.EXACT_DEDUP_ORACLE,
        "dedup_ngram_jaccard": D.NGRAM_JACCARD_ORACLE,
        "dedup_minhash_lsh": D.MINHASH_LSH_ORACLE,
        "dedup_simhash": D.SIMHASH_ORACLE,
        "dedup_url_normalize": D.URL_NORMALIZE_ORACLE,
        "dedup_incremental": D.INCREMENTAL_DEDUP_ORACLE,
        "dedup_repeated_spans": D.SPAN_DEDUP_ORACLE,
        "ann_brute_force_topk": S.BRUTE_FORCE_ORACLE,
        "ann_lsh_bucket": S.LSH_ANN_ORACLE,
        "ann_lsh_multiprobe": S.LSH_MULTIPROBE_ORACLE,
        "ann_ivf_probe": S.IVF_ANN_ORACLE,
        "ann_ivf_multiprobe": S.IVF_MULTIPROBE_ORACLE,
        "embedding_near_dup": S.EMBEDDING_NEAR_DUP_ORACLE,
        "media_metadata": M.MEDIA_METADATA_ORACLE,
        "media_frame_sample": M.MEDIA_FRAME_SAMPLE_ORACLE,
        "media_decode_resize": M.MEDIA_DECODE_RESIZE_ORACLE,
        "media_audio_features": M.MEDIA_AUDIO_ORACLE,
        "politeness_schedule": SCH.POLITENESS_ORACLE,
        "politeness_schedule_grouped": SCH.POLITENESS_ORACLE,
        "p1_strip_special": R.P1_ORACLE,
        "p3_keyword_gate": R.P3_ORACLE,
        "a1_avg_by_group": R.A1_ORACLE,
        "a2_first_event_per_user": R.A2_ORACLE,
        "a4_collect_per_group": R.A4_ORACLE,
        "w1_topk_per_group": R.W1_ORACLE,
        "j1_broadcast_join": R.J1_ORACLE,
        "j2_anti_join_resume": R.J2_ORACLE,
        "j3_large_join_smj": R.J3_ORACLE,
        "s1_top_orders": R.S1_ORACLE,
        "set_except_types": R.SET_ORACLE,
        "q1_pricing_summary": R.Q1_ORACLE,
        "f_json_extract": R.F_JSON_ORACLE,
        "w2_lag_moving_avg": A.W2_LAG_ORACLE,
        "w4_ntile_rank": A.W4_NTILE_ORACLE,
        "rollup_daily_counts": A.ROLLUP_ORACLE,
        "cube_type_bucket": A.CUBE_ORACLE,
        "asof_last_click": A.ASOF_ORACLE,
        "pivot_user_type_counts": A.PIVOT_ORACLE,
        "pctl_value_by_type": A.PCTL_ORACLE,
        "sessionize_batch": A.SESSIONIZE_ORACLE,
        "w3_tumbling_host_counts": _tumbling_oracle(),
        "band_range_join": A.BAND_ORACLE,
        "intersect_types": A.INTERSECT_ORACLE,
    }
