"""Round-trip checks for the binary->binary multimodal transforms
(the decode-side feature extractors are covered in test_operators.py
and by the LCG-oracle keys in test_queries_oracle.py)."""

from pyspark.sql import functions as F

from wrds2pg_spark.sources.testdata import load_table


def test_resize_roundtrips_through_decoder(spark):
    """The re-encoded half-size BMP must be a valid BMP: feeding it
    back through decode_image_bmp yields the halved dims, and the
    decoded stream stays in pixel range."""
    from wrds2pg_spark.operators.multimodal import (
        decode_image_bmp, resize_image_bmp, synth_bmp,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    resized = resize_image_bmp(synth_bmp(docs, "doc_id"), "payload", "id")
    redecoded = decode_image_bmp(
        resized.select("id", F.col("resized").alias("payload")),
        "payload", "id",
    ).collect()
    dims = {r["id"]: (r["out_width"], r["out_height"])
            for r in resized.collect()}
    assert len(redecoded) == 20
    for r in redecoded:
        assert (r["width"], r["height"]) == dims[r["id"]]
        assert r["bpp"] == 24
        assert 0.0 <= r["mean_luma"] <= 255.0
