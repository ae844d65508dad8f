from __future__ import annotations

import pytest

from soccerpredictor_spark.operators import multimodal as MM
from soccerpredictor_spark.sources.sinks import export_small


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=30).cache()


def test_feature_extraction_shape(media):
    feats = MM.extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == MM.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.features)
        assert r.n_bytes >= 128
        assert len(r.payload_fp) == 32


def test_feature_extraction_deterministic(media):
    a = {r.media_id: r.payload_fp for r in MM.extract_features(media).collect()}
    b = {r.media_id: r.payload_fp for r in MM.extract_features(media).collect()}
    assert a == b


def test_metadata_filter_prunes_payload(media):
    plan = MM.metadata_filter(media, 80)._jdf.queryExecution().executedPlan().toString()
    got = MM.metadata_filter(media, 80).collect()
    assert all(r.media_id >= 16 for r in got)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x00")


def test_frame_sample_plan(media):
    frames = MM.frame_sample_plan(media, every_n=5)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) == n_videos * 5


def test_export_small(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    out = export_small(df, str(tmp_path / "out.csv"))
    assert out.endswith(".csv")
    with open(out) as f:
        assert f.read().startswith("id,v")


def test_export_guard(spark, tmp_path):
    df = spark.range(100)
    with pytest.raises(ValueError):
        export_small(df, str(tmp_path / "big.csv"), max_rows=10)


def test_export_xlsx_falls_back_to_csv_without_openpyxl(spark, tmp_path):
    """S9 Excel path: the reference emits real .xlsx
    (XGBoost/Predictor.py:132). This container has no openpyxl, so the
    documented fallback must kick in: the .xlsx request lands as .csv
    and the returned path reflects it. (With openpyxl installed the
    same call writes the real workbook — the gate is the import, not
    our code path.)"""
    import importlib.util

    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    out = export_small(df, str(tmp_path / "report.xlsx"))
    if importlib.util.find_spec("openpyxl") is None:
        assert out.endswith("report.csv")
        assert (tmp_path / "report.csv").exists()
    else:  # pragma: no cover - container has no openpyxl
        assert out.endswith("report.xlsx")
        assert (tmp_path / "report.xlsx").exists()
