"""Multimodal plumbing: typed binary/meta schema, the stubbed decoder
gate, and frame-sampling byte conservation. (The decode path's row-level
correctness is oracle-verified in test_oracle_diff via
multimodal_decoded_dims.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from large_csv_etl_spark.io import load_table
from large_csv_etl_spark.multimodal import (
    attach_payload,
    decode_payloads,
    sample_frames,
)

from .conftest import SF_DIR


def test_payload_schema_types(spark):
    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    dtypes = dict(p.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<mime:string")


def _has_pil() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="Pillow installed — gate not active")
def test_real_decoder_is_gated_not_fake(spark):
    """Without Pillow, stub=False must fail loudly (NotImplementedError
    via the worker-side import-try) — never silently fall back to fake
    dimensions."""
    p = attach_payload(load_table(spark, SF_DIR, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|Pillow|stub"):
        decode_payloads(p, stub=False).collect()


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_real_decoder_decodes_png(spark):
    """With Pillow present, stub=False is a REAL decode: a generated
    5x3 RGB PNG payload comes back with its true dimensions and band
    count (proves the stub/real switch is wired, not asserted)."""
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (5, 3), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = decode_payloads(df, stub=False).collect()[0]
    assert (row.width, row.height, row.n_channels) == (5, 3, 3)


def test_frame_sampling_conserves_bytes(spark):
    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    frames = sample_frames(p, every_n_bytes=64)
    check = (
        frames.groupBy("doc_id")
        .agg(F.sum(F.octet_length("frame_bytes")).alias("reassembled"))
        .join(p.select("doc_id", F.col("meta.n_bytes").alias("orig")), "doc_id")
        .filter(F.col("reassembled") != F.col("orig"))
    )
    assert check.count() == 0


def test_resize_is_aspect_fit(spark):
    """Output dims never exceed the 224 target, scale is the binding
    dimension's, and aspect ratio is preserved to fixed-point tolerance."""
    from large_csv_etl_spark.multimodal import resize_payloads

    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    rows = resize_payloads(p, target=224).collect()
    assert rows
    for r in rows:
        assert 1 <= r.out_w <= 224 and 1 <= r.out_h <= 224
        assert max(r.out_w, r.out_h) >= 220  # binding dim lands near target
        # fixed-point scale applied to both dims identically
        assert r.out_w == max(1, r.width * r.scale_fp // 1_000_000)
        assert r.out_h == max(1, r.height * r.scale_fp // 1_000_000)


def test_audio_windows_manifest(spark):
    from large_csv_etl_spark.queries.multimodal import QUERIES as MM

    rows = MM["multimodal_audio_windows"](spark, SF_DIR).collect()
    for r in rows:
        assert (r.n_windows == 0) == (r.n_samples == 0)
        if r.n_samples >= 400:
            assert r.n_windows == 1 + (r.n_samples - 400) // 160


def _write_png(width, height, rgb):
    """Minimal stdlib-only PNG writer (8-bit RGB, non-interlaced) so the
    real-decode branch can be exercised without Pillow."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_real_decoder_decodes_png_without_pillow(spark):
    """stub=False actually EXECUTES in this container: a stdlib-written
    5x3 RGB PNG round-trips through the vendored pure-zlib decoder on
    the workers with its true dimensions and band count (closes the
    'real branch asserted-by-design but never run' residual; with
    Pillow installed the same test covers the Pillow branch instead)."""
    png = _write_png(5, 3, (200, 10, 10))
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    row = decode_payloads(df, stub=False).collect()[0]
    assert (row.width, row.height, row.n_channels) == (5, 3, 3)


def test_pure_png_decoder_rejects_truncated_stream(spark):
    """A PNG whose pixel stream is short (corrupt IDAT) must fail the
    length verification loudly, not return header dims."""
    import pytest as _pytest
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 5, 3, 8, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 5))  # 1 row, not 3
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [(1, bytearray(bad))], "doc_id long, payload binary"
    )
    if _has_pil():
        _pytest.skip("Pillow present: the pure decoder is not on this path")
    with _pytest.raises(Exception, match="pixel stream|expected"):
        decode_payloads(df, stub=False).collect()


def _write_png_gray(px_rows, ftype):
    """Stdlib PNG writer for 8-bit grayscale with a chosen per-row filter
    type (0=None, 1=Sub, 2=Up) — the same image encoded under different
    filters must decode to identical pixels."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    height, width = len(px_rows), len(px_rows[0])
    raw = bytearray()
    prev = [0] * width
    for row in px_rows:
        raw.append(ftype)
        if ftype == 0:
            enc = row
        elif ftype == 1:  # Sub
            enc = [
                (row[i] - (row[i - 1] if i else 0)) & 0xFF
                for i in range(width)
            ]
        elif ftype == 2:  # Up
            enc = [(row[i] - prev[i]) & 0xFF for i in range(width)]
        else:
            raise ValueError(ftype)
        raw.extend(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _gradient(width=32, height=24):
    return [
        [(x * 8 + y * 3) % 256 for x in range(width)] for y in range(height)
    ]


def test_ahash_real_decode_is_filter_invariant(spark):
    """The same grayscale image encoded with PNG filter None, Sub, and Up
    must produce the SAME perceptual hash through the real decode path —
    proving the defiltering is correct, not just that headers parse."""
    from large_csv_etl_spark.multimodal import ahash_payloads

    img = _gradient()
    rows = [
        (f, bytearray(_write_png_gray(img, f))) for f in (0, 1, 2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = ahash_payloads(df, stub=False).collect()
    hashes = {r.ahash for r in out}
    assert len(hashes) == 1, f"filter variants hashed differently: {out}"
    assert all((r.width, r.height) == (32, 24) for r in out)


def test_ahash_is_perceptual_not_exact(spark):
    """A one-unit brightness perturbation keeps the hash; an inverted
    image flips it — equality means perceptual match, not byte match."""
    from large_csv_etl_spark.multimodal import ahash_payloads

    img = _gradient()
    tweaked = [row[:] for row in img]
    tweaked[0][0] = (tweaked[0][0] + 1) % 256  # sub-perceptual change
    inverted = [[255 - v for v in row] for row in img]
    df = spark.createDataFrame(
        [
            (1, bytearray(_write_png_gray(img, 0))),
            (2, bytearray(_write_png_gray(tweaked, 0))),
            (3, bytearray(_write_png_gray(inverted, 0))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.ahash for r in ahash_payloads(df, stub=False).collect()}
    assert out[1] == out[2], "tiny perturbation should not change aHash"
    assert out[1] != out[3], "inverted image must hash differently"


def test_ahash_stub_path_deterministic_and_groups_exact_dups(spark):
    """The fixture-facing stub path is deterministic across runs, and
    byte-identical payloads always share a hash (the bucket-grouping
    premise of multimodal_ahash_neardup)."""
    from large_csv_etl_spark.multimodal import ahash_payloads

    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    a = sorted(map(tuple, ahash_payloads(p, stub=True).collect()))
    b = sorted(map(tuple, ahash_payloads(p, stub=True).collect()))
    assert a == b
    dup = spark.createDataFrame(
        [(1, bytearray(b"same-bytes" * 40)), (2, bytearray(b"same-bytes" * 40))],
        "doc_id long, payload binary",
    )
    out = ahash_payloads(dup, stub=True).collect()
    assert out[0].ahash == out[1].ahash


def test_phash_real_decode_filter_invariant_and_brightness_robust(spark):
    """pHash through the real decode path: PNG filter variants collapse to
    one hash (decoder correctness), and a global +40 brightness shift —
    which moves every aHash block mean — preserves the pHash exactly
    (DCT AC coefficients are shift-invariant; the median threshold
    absorbs the DC change). An inverted image must differ."""
    from large_csv_etl_spark.multimodal import phash_payloads

    img = _gradient()
    brightened = [[min(v + 40, 255) for v in row] for row in img]
    inverted = [[255 - v for v in row] for row in img]
    rows = [(f, bytearray(_write_png_gray(img, f))) for f in (0, 1, 2)]
    rows += [
        (10, bytearray(_write_png_gray(brightened, 0))),
        (11, bytearray(_write_png_gray(inverted, 0))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r.phash for r in phash_payloads(df, stub=False).collect()}
    assert out[0] == out[1] == out[2], "filter variants must hash equal"
    assert out[0] == out[10], "global brightness shift must not move pHash"
    assert out[0] != out[11], "inverted image must hash differently"


def test_phash_stub_path_deterministic_and_groups_exact_dups(spark):
    from large_csv_etl_spark.multimodal import phash_payloads

    p = attach_payload(load_table(spark, SF_DIR, "documents"))
    a = sorted(map(tuple, phash_payloads(p, stub=True).collect()))
    b = sorted(map(tuple, phash_payloads(p, stub=True).collect()))
    assert a == b
    dup = spark.createDataFrame(
        [(1, bytearray(b"same-bytes" * 40)), (2, bytearray(b"same-bytes" * 40))],
        "doc_id long, payload binary",
    )
    out = phash_payloads(dup, stub=True).collect()
    assert out[0].phash == out[1].phash


def test_scene_cuts_on_planted_two_scene_stream(spark):
    """A payload whose frames repeat byte-identical content except for an
    abrupt mid-stream content change must yield exactly one detected
    cut; a constant stream yields zero. Drives the registry entry's
    exact pipeline (sample_frames stride 64 + stub aHash + Hamming>16)
    through the public query function on a planted documents table."""
    from large_csv_etl_spark.queries.multimodal import multimodal_scene_cuts

    # two docs: constant frames; and scene A x4 then scene B x4
    a = b"A" * 256
    bb = (b"scene-one-bytes!" * 4)[:64] * 4 + (b"other-scene-!!!!" * 4)[:64] * 4
    df = spark.createDataFrame(
        [(1, a.decode(), "en", "s0", len(a)), (2, bb.decode(), "en", "s0", len(bb))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="scenecut_")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in multimodal_scene_cuts(spark, d).collect()}
    assert out[1].n_cuts == 0, out[1]
    assert out[2].n_cuts == 1, out[2]
    assert out[1].n_frames == 4 and out[2].n_frames == 8
