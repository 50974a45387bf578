"""Query registry: every operator/pipeline from SURVEY.md §2 (plus the
training-data ops) as a ``(sf_dir) -> Dataset|DataFrame`` callable, with
a DuckDB oracle SQL string wherever the semantics are SQL-expressible.

Float policy for oracle comparison (every oracle row is bit-exact
under STRICT float equality at sf0.001/sf0.01):
1. sums that must match exactly are computed on integers (cents, cell
   counts) with ONE final division — order-exact in both engines;
2. inexact-weight folds run in the SAME explicit order on both sides
   (texture.py 64-term folds), and rounding uses one shared
   half-away-from-zero formula (texture.r6/_sql_r6) — numpy's
   half-even differs exactly on dyadic boundaries;
3. seconds columns mirror DuckDB's ``epoch(interval)`` float path
   (days*86400.0 + micros/1e6; stages/window.us_seconds), which
   differs from pandas total_seconds in the last ulp;
4. generated SQL CASTs all literals/aggregates to DOUBLE — DuckDB
   parses bare decimals as DECIMAL and its exact decimal arithmetic
   rounds differently from the engine's doubles.

Structure (r5, VERDICT item 7): the former single-file queries.py is
split into themed ``qNN_*`` modules, imported here in the ORIGINAL
source order so registration order — and therefore the driver's
export window — is unchanged. ``_shared`` holds the registry
(``register`` / QUERIES / ORACLE), constants, and the guarded
helpers (``_path`` / ``_read_dim`` / ``_combine_partials``). The
package ``__getattr__`` below resolves any name from any submodule,
so every pre-split import path keeps working (tools/split_queries.py
is the generator; its golden-validation protocol is documented
there)."""
from __future__ import annotations

from . import _shared
from . import q00_documents_per_row
from . import q01_events_windowed_temporal
from . import q02_tpc_h_ish
from . import q03_embeddings_similarity_search
from . import q04_multimodal_plumbing_codec
from . import q05_pages_flagship
from . import q06_pages_flagship_2
from . import q07_round_4_additions
from . import q08_tpc_h_shaped
from . import q09_events_activity_streaks
from . import q10_feature_engineering_readability
from . import q11_distribution_census_supplier
from . import q12_graph_analytics_experimentation
from . import q13_embedding_table_operators
from . import q14_retrieval_rank_fusion
from . import q15_rfm_segmentation_month
from . import q16_asymmetric_containment_dedup
from . import q17_day_of_week
from . import q18_tpc_h_q7
from . import q19_ltv_cohort_matrix
from . import q20_seasonality_strength_one
from . import q21_conversion_lag_grouped
from . import q22_quality_based_dedup
from . import q23_catalog_census_ingestion
from . import q24_float_quantiles_via
from . import q25_classifier_evaluation_confusion
from . import q26_round_5_tpc
from . import q27_round_5_tpc_2
from . import q28_session2_additions
from . import q29_session2_additions_2
from . import q30_session2_additions_3
from . import q31_session2_additions_4
from . import q32_session2_additions_5
from . import q33_session2_additions_6
from . import q34_session2_additions_7
from . import q35_session2_additions_8
from . import q36_session2_additions_9
from . import q37_session2_additions_10
from . import q38_session2_additions_11
from . import q39_session2_additions_12
from . import q40_session2_additions_13
from . import q41_session2_additions_14
from . import q42_session2_additions_15
from . import q43_session2_additions_16
from . import q44_session2_additions_17
from . import q45_session2_additions_18
from . import q46_session2_additions_19
from . import q47_session2_additions_20
from . import q48_session2_additions_21
from . import q49_session3_additions
from . import q50_session3_additions_2
from . import q51_session3_additions_3
from . import q52_session3_additions_4
from . import q53_session3_additions_5
from . import q54_session3_additions_6
from . import q55_session3_additions_7
from . import q56_session3_additions_8
from . import q57_session3_additions_9
from . import q58_session4_additions
from . import q59_session4_additions_2
from . import q60_session4_additions_3
from . import q61_session4_additions_4
from . import q62_session4_additions_5
from . import q63_session5_additions
from . import q64_session5_additions_2
from . import q65_session5_additions_3
from . import q66_session5_additions_4
from . import q67_session5_additions_5
from . import q68_session5_additions_6
from . import q69_session5_additions_7
from . import q70_session5_additions_8
from . import q71_session5_additions_9
from . import q72_session5_additions_10
from . import q73_session5_additions_11
from . import q74_session5_additions_12
from . import q75_session5_additions_13
from . import q76_session5_additions_14
from . import q77_session5_additions_15
from . import q78_session5_additions_16
from . import q79_session5_additions_17
from . import q80_session5_additions_18
from . import q81_session5_additions_19
from . import q82_session5_additions_20
from . import q83_session5_additions_21
from . import q84_session5_additions_22
from . import q85_session5_additions_23
from . import q86_session5_additions_24
from . import q87_session5_additions_25
from . import q88_session5_additions_26
from . import q89_session5_additions_27
from . import q90_session5_additions_28
from . import q91_session5_additions_29
from . import q92_session5_additions_30
from . import q93_session5_additions_31
from . import q94_session5_additions_32
from . import q95_session5_additions_33
from . import q96_session5_additions_34
from . import q97_session5_additions_35
from . import q98_session5_additions_36
from . import q99_session5_additions_37
from . import q100_session5_additions_38
from . import q101_session5_additions_39
from . import q102_session5_additions_40
from . import q103_session5_additions_41
from . import q104_session5_additions_42
from . import q105_session5_additions_43
from . import q106_session5_additions_44
from . import q107_session5_additions_45
from . import q108_session5_additions_46
from . import q109_session5_additions_47
from . import q110_session5_additions_48
from . import q111_session5_additions_49
from . import q112_session5_additions_50
from . import q113_session5_additions_51
from . import q114_session5_additions_52
from . import q115_session5_additions_53
from . import q116_session5_additions_54
from . import q117_session5_additions_55
from . import q118_session5_additions_56
from . import q119_session5_additions_57
from . import q120_session5_additions_58
from . import q121_session5_additions_59
from . import q122_session5_additions_60
from . import q123_session5_additions_61
from . import q124_session5_additions_62
from . import q125_session5_additions_63
from . import q126_session5_additions_64
from . import q127_session5_additions_65
from . import q128_session5_additions_66
from . import q129_session5_additions_67
from . import q130_session5_additions_68
from . import q131_session5_additions_69
from . import q132_session5_additions_70
from . import q133_session5_additions_71
from . import q134_session5_additions_72
from . import q135_session5_additions_73
from . import q136_session5_additions_74
from . import q137_session5_additions_75
from . import q138_session5_additions_76
from . import q139_session5_additions_77
from . import q140_session5_additions_78
from . import q141_session5_additions_79
from . import q142_session5_additions_80
from . import q143_session5_additions_81
from . import q144_session5_additions_82
from . import q145_session5_additions_83
from . import q146_session5_additions_84
from . import q147_session5_additions_85
from . import q148_session5_additions_86
from . import q149_session5_additions_87
from . import q150_session5_additions_88
from . import q151_session5_additions_89
from . import q152_session5_additions_90
from . import q153_session5_additions_91
from . import q154_session5_additions_92
from . import q155_session5_additions_93
from . import q156_session5_additions_94
from . import q157_session5_additions_95
from . import q158_session5_additions_96
from . import q159_session5_additions_97
from . import q160_session5_additions_98
from . import q161_session5_additions_99
from . import q162_session5_additions_100
from . import q163_session5_additions_101

from ._shared import *  # noqa: F401,F403

_SUBMODULES = [_shared, q00_documents_per_row, q01_events_windowed_temporal, q02_tpc_h_ish, q03_embeddings_similarity_search, q04_multimodal_plumbing_codec, q05_pages_flagship, q06_pages_flagship_2, q07_round_4_additions, q08_tpc_h_shaped, q09_events_activity_streaks, q10_feature_engineering_readability, q11_distribution_census_supplier, q12_graph_analytics_experimentation, q13_embedding_table_operators, q14_retrieval_rank_fusion, q15_rfm_segmentation_month, q16_asymmetric_containment_dedup, q17_day_of_week, q18_tpc_h_q7, q19_ltv_cohort_matrix, q20_seasonality_strength_one, q21_conversion_lag_grouped, q22_quality_based_dedup, q23_catalog_census_ingestion, q24_float_quantiles_via, q25_classifier_evaluation_confusion, q26_round_5_tpc, q27_round_5_tpc_2, q28_session2_additions, q29_session2_additions_2, q30_session2_additions_3, q31_session2_additions_4, q32_session2_additions_5, q33_session2_additions_6, q34_session2_additions_7, q35_session2_additions_8, q36_session2_additions_9, q37_session2_additions_10, q38_session2_additions_11, q39_session2_additions_12, q40_session2_additions_13, q41_session2_additions_14, q42_session2_additions_15, q43_session2_additions_16, q44_session2_additions_17, q45_session2_additions_18, q46_session2_additions_19, q47_session2_additions_20, q48_session2_additions_21, q49_session3_additions, q50_session3_additions_2, q51_session3_additions_3, q52_session3_additions_4, q53_session3_additions_5, q54_session3_additions_6, q55_session3_additions_7, q56_session3_additions_8, q57_session3_additions_9, q58_session4_additions, q59_session4_additions_2, q60_session4_additions_3, q61_session4_additions_4, q62_session4_additions_5, q63_session5_additions, q64_session5_additions_2, q65_session5_additions_3, q66_session5_additions_4, q67_session5_additions_5, q68_session5_additions_6, q69_session5_additions_7, q70_session5_additions_8, q71_session5_additions_9, q72_session5_additions_10, q73_session5_additions_11, q74_session5_additions_12, q75_session5_additions_13, q76_session5_additions_14, q77_session5_additions_15, q78_session5_additions_16, q79_session5_additions_17, q80_session5_additions_18, q81_session5_additions_19, q82_session5_additions_20, q83_session5_additions_21, q84_session5_additions_22, q85_session5_additions_23, q86_session5_additions_24, q87_session5_additions_25, q88_session5_additions_26, q89_session5_additions_27, q90_session5_additions_28, q91_session5_additions_29, q92_session5_additions_30, q93_session5_additions_31, q94_session5_additions_32, q95_session5_additions_33, q96_session5_additions_34, q97_session5_additions_35, q98_session5_additions_36, q99_session5_additions_37, q100_session5_additions_38, q101_session5_additions_39, q102_session5_additions_40, q103_session5_additions_41, q104_session5_additions_42, q105_session5_additions_43, q106_session5_additions_44, q107_session5_additions_45, q108_session5_additions_46, q109_session5_additions_47, q110_session5_additions_48, q111_session5_additions_49, q112_session5_additions_50, q113_session5_additions_51, q114_session5_additions_52, q115_session5_additions_53, q116_session5_additions_54, q117_session5_additions_55, q118_session5_additions_56, q119_session5_additions_57, q120_session5_additions_58, q121_session5_additions_59, q122_session5_additions_60, q123_session5_additions_61, q124_session5_additions_62, q125_session5_additions_63, q126_session5_additions_64, q127_session5_additions_65, q128_session5_additions_66, q129_session5_additions_67, q130_session5_additions_68, q131_session5_additions_69, q132_session5_additions_70, q133_session5_additions_71, q134_session5_additions_72, q135_session5_additions_73, q136_session5_additions_74, q137_session5_additions_75, q138_session5_additions_76, q139_session5_additions_77, q140_session5_additions_78, q141_session5_additions_79, q142_session5_additions_80, q143_session5_additions_81, q144_session5_additions_82, q145_session5_additions_83, q146_session5_additions_84, q147_session5_additions_85, q148_session5_additions_86, q149_session5_additions_87, q150_session5_additions_88, q151_session5_additions_89, q152_session5_additions_90, q153_session5_additions_91, q154_session5_additions_92, q155_session5_additions_93, q156_session5_additions_94, q157_session5_additions_95, q158_session5_additions_96, q159_session5_additions_97, q160_session5_additions_98, q161_session5_additions_99, q162_session5_additions_100, q163_session5_additions_101]


def __getattr__(name):
    """Package-level name lookup across the split modules, so every
    pre-split import path (public or underscore) keeps working."""
    for _m in _SUBMODULES:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(name)
