

def test_real_decode_when_pillow_present(spark):
    """Gate for the optional-dependency real codec: auto-skips while
    Pillow is absent from the image; the moment it appears, the REAL
    decode runs through the exact same Spark plumbing (Arrow batches,
    schema, mapInPandas) as the stub and must report true pixel
    dimensions."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from qms_datawarehouse_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        extract_features_with,
        pil_decode,
    )

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(20, 10), "image/png"), (2, png(7, 33), "image/png")],
        "doc_id long, content binary, format string",
    )
    out = {
        r.doc_id: (r.width, r.height)
        for r in df.mapInPandas(
            extract_features_with(pil_decode), schema=FEATURE_SCHEMA
        ).collect()
    }
    assert out == {1: (20, 10), 2: (7, 33)}
