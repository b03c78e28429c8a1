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


# ---------------------------------------------------------------------------
# Vendored baseline-JPEG decoder conformance (the round-14 gate-narrowing:
# decode_payloads/ahash/phash stub=False now handle baseline JPEG without
# Pillow; only progressive/arithmetic/12-bit remain Pillow-gated). The
# encoder below is a minimal test-side baseline encoder — per-image
# canonical Huffman tables, single quant table — so the decoder is proven
# against an EXPECTED reconstruction computed through the same public
# dequant+IDCT formula, not just against headers.
# ---------------------------------------------------------------------------

_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
    28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
    37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
    54, 47, 55, 62, 63,
]


def _jpeg_basis():
    import numpy as np

    n8 = np.arange(8)
    a = np.cos((2 * n8[:, None] + 1) * n8[None, :] * np.pi / 16)
    alpha = np.full(8, 0.5)
    alpha[0] = np.sqrt(0.125)
    return a * alpha[None, :]


class _JpegBits:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, value, nbits):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.put(1, 1)


def _jpeg_quantize(plane, qtab_nat):
    """Per-8x8-block forward DCT + quantize. Returns (zigzag coef blocks
    in raster order, expected reconstruction through the decoder's own
    float64 dequant+IDCT+rint+clip path)."""
    import numpy as np

    a = _jpeg_basis()
    h, w = plane.shape
    blocks, recon = [], np.zeros_like(plane)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            fc = a.T @ (blk - 128.0) @ a
            q = np.rint(fc / qtab_nat.reshape(8, 8)).astype(np.int64)
            blocks.append(
                np.array([q.flat[_JPEG_ZZ[k]] for k in range(64)], np.int64)
            )
            px = a @ (q * qtab_nat.reshape(8, 8)).astype(float) @ a.T
            recon[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.rint(px) + 128, 0, 255
            ).astype(plane.dtype)
    return blocks, recon


def _write_jpeg(planes, w, h, sampling, qtab_zz=None, restart=0):
    """Minimal baseline JPEG encoder (tests only). planes: comp_id ->
    2-D int array padded to block multiples; sampling: comp_id ->
    (h, v). One quant + one DC + one AC table serve all components.
    Returns (jpeg bytes, expected luma reconstruction at luma res)."""
    import numpy as np

    if qtab_zz is None:
        qtab_zz = np.ones(64, np.int64)
    qtab_nat = np.zeros(64, np.int64)
    for k in range(64):
        qtab_nat[_JPEG_ZZ[k]] = qtab_zz[k]
    comp_ids = sorted(planes)
    hmax = max(s[0] for s in sampling.values())
    vmax = max(s[1] for s in sampling.values())

    per_comp, recon0 = {}, None
    for cid in comp_ids:
        blocks, recon = _jpeg_quantize(planes[cid], qtab_nat)
        per_comp[cid] = blocks
        if cid == comp_ids[0]:
            recon0 = recon

    # scan-order block stream + MCU boundaries (for restart placement)
    stream, bounds = [], []
    if len(comp_ids) == 1:
        cid = comp_ids[0]
        stream = [(c, cid) for c in per_comp[cid]]
        bounds = list(range(1, len(stream) + 1))
    else:
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                for cid in comp_ids:
                    hc, vc = sampling[cid]
                    bw_ = planes[cid].shape[1] // 8
                    for by in range(vc):
                        for bx in range(hc):
                            idx = (my * vc + by) * bw_ + (mx * hc + bx)
                            stream.append((per_comp[cid][idx], cid))
                bounds.append(len(stream))

    # AC symbol census (DC carries the full 12-size alphabet: restart
    # resets prediction, so collected diffs differ from encode-time)
    ac_used = {0x00}
    for coefs, _cid in stream:
        nz = [k for k in range(1, 64) if coefs[k]]
        k, run = 1, 0
        for k in range(1, (nz[-1] + 1) if nz else 1):
            if coefs[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_used.add(0xF0)
                run -= 16
            s = int(abs(int(coefs[k]))).bit_length()
            ac_used.add((run << 4) | s)
            run = 0
    dc_syms, ac_syms = list(range(12)), sorted(ac_used)

    def canonical(symbols):
        n = len(symbols)
        ln = 2
        while (1 << ln) < n + 1:  # never assigns the all-ones code
            ln += 1
        return {sym: (i, ln) for i, sym in enumerate(symbols)}, ln

    dc_codes, ld = canonical(dc_syms)
    ac_codes, la = canonical(ac_syms)

    def seg(marker, payload):
        return marker + (len(payload) + 2).to_bytes(2, "big") + payload

    def dht(tc, th, symbols, ln):
        counts = [0] * 16
        counts[ln - 1] = len(symbols)
        return seg(
            b"\xff\xc4",
            bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols),
        )

    out = bytearray(b"\xff\xd8")
    out += seg(b"\xff\xdb", b"\x00" + bytes(int(x) for x in qtab_zz))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comp_ids))
    for cid in comp_ids:
        hc, vc = sampling[cid]
        sof += bytes([cid, (hc << 4) | vc, 0])
    out += seg(b"\xff\xc0", bytes(sof))
    out += dht(0, 0, dc_syms, ld)
    out += dht(1, 0, ac_syms, la)
    if restart:
        out += seg(b"\xff\xdd", restart.to_bytes(2, "big"))
    sos = bytearray([len(comp_ids)])
    for cid in comp_ids:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(b"\xff\xda", bytes(sos))

    bits = _JpegBits()
    pred, rst, pos = {}, 0, 0
    for mi, end in enumerate(bounds):
        if restart and mi and mi % restart == 0:
            bits.align()
            out += bits.out
            bits.out = bytearray()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = {}
        while pos < end:
            coefs, chan = stream[pos]
            pos += 1
            diff = int(coefs[0]) - pred.get(chan, 0)
            pred[chan] = int(coefs[0])
            s = int(abs(diff)).bit_length()
            code, ln = dc_codes[s]
            bits.put(code, ln)
            if s:
                bits.put((diff if diff > 0 else diff + (1 << s) - 1)
                         & ((1 << s) - 1), s)
            nz = [k for k in range(1, 64) if coefs[k]]
            last = nz[-1] if nz else 0
            k, run = 1, 0
            while k <= last:
                v = int(coefs[k])
                if v == 0:
                    run += 1
                    k += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bits.put(code, ln)
                    run -= 16
                s = int(abs(v)).bit_length()
                code, ln = ac_codes[(run << 4) | s]
                bits.put(code, ln)
                bits.put((v if v > 0 else v + (1 << s) - 1)
                         & ((1 << s) - 1), s)
                run = 0
                k += 1
            if last < 63:
                code, ln = ac_codes[0x00]
                bits.put(code, ln)
    bits.align()
    out += bits.out + b"\xff\xd9"
    return bytes(out), recon0


def test_jpeg_decoder_exact_reconstruction_unit():
    """Direct conformance: decode equals the expected dequant+IDCT
    reconstruction BIT-FOR-BIT across gray, quantized-gray, restart,
    4:2:0 and 4:2:2 streams; near-lossless (all-ones quant) output
    stays within 1 count of the source pixels."""
    import numpy as np

    from large_csv_etl_spark.multimodal import _make_jpeg_decoder

    jd = _make_jpeg_decoder()
    g = np.array(
        [[(x * 8 + y * 3) % 256 for x in range(32)] for y in range(24)],
        np.int64,
    )
    jb, recon = _write_jpeg({1: g}, 32, 24, {1: (1, 1)})
    w, h, nc, y = jd(jb)
    assert (w, h, nc) == (32, 24, 1)
    assert np.array_equal(y, recon)
    assert int(np.abs(y - g).max()) <= 1

    qz = np.array([16] + [10] * 20 + [24] * 43, np.int64)
    jb, recon = _write_jpeg({1: g}, 32, 24, {1: (1, 1)}, qtab_zz=qz)
    assert np.array_equal(jd(jb)[3], recon)

    jb, recon = _write_jpeg({1: g}, 32, 24, {1: (1, 1)}, restart=3)
    assert np.array_equal(jd(jb)[3], recon)

    ylum = np.array(
        [[(x * 5 + y * 7) % 256 for x in range(32)] for y in range(32)],
        np.int64,
    )
    chroma = np.full((16, 16), 128, np.int64)
    jb, recon = _write_jpeg(
        {1: ylum, 2: chroma, 3: chroma}, 32, 32,
        {1: (2, 2), 2: (1, 1), 3: (1, 1)},
    )
    w, h, nc, y = jd(jb)
    assert (w, h, nc) == (32, 32, 3)
    assert np.array_equal(y, recon[:32, :32])

    jb, recon = _write_jpeg(
        {1: ylum[:16, :], 2: chroma, 3: chroma}, 32, 16,
        {1: (2, 1), 2: (1, 1), 3: (1, 1)},
    )
    w, h, nc, y = jd(jb)
    assert (w, h, nc) == (32, 16, 3)
    assert np.array_equal(y, recon[:16, :32])


def test_jpeg_decoder_corruption_vs_gate_distinction():
    """Truncated entropy data is CORRUPTION (ValueError), progressive is
    an ENVIRONMENT GATE (NotImplementedError naming Pillow) — a broken
    payload must never be misreported as a missing dependency."""
    import numpy as np
    import pytest as _pytest

    from large_csv_etl_spark.multimodal import _make_jpeg_decoder

    jd = _make_jpeg_decoder()
    g = np.arange(64, dtype=np.int64).reshape(8, 8) * 3 % 256
    jb, _ = _write_jpeg({1: g}, 8, 8, {1: (1, 1)})
    with _pytest.raises(ValueError, match="truncated|sync|Huffman"):
        jd(jb[:-6])
    prog = (
        b"\xff\xd8\xff\xc2" + (11).to_bytes(2, "big")
        + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    with _pytest.raises(NotImplementedError, match="Pillow"):
        jd(prog)


def test_real_decoder_decodes_jpeg_through_spark(spark):
    """decode_payloads(stub=False) on a 4:2:0 color JPEG returns its
    true dimensions and component count through the mapInPandas seam —
    without Pillow this rides the vendored decoder's full entropy walk
    (and with Pillow installed the same assertions cover that branch)."""
    import numpy as np

    ylum = np.array(
        [[(x * 5 + y * 7) % 256 for x in range(32)] for y in range(32)],
        np.int64,
    )
    chroma = np.full((16, 16), 128, np.int64)
    jb, _ = _write_jpeg(
        {1: ylum, 2: chroma, 3: chroma}, 32, 32,
        {1: (2, 2), 2: (1, 1), 3: (1, 1)},
    )
    gray, _ = _write_jpeg({1: ylum}, 32, 32, {1: (1, 1)})
    df = spark.createDataFrame(
        [(1, bytearray(jb)), (2, bytearray(gray))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_payloads(df, stub=False).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (32, 32, 3)
    assert (rows[2].width, rows[2].height, rows[2].n_channels) == (32, 32, 1)


def test_ahash_jpeg_layout_invariance_and_png_agreement(spark):
    """The same image must hash identically whether its JPEG bitstream
    uses restart markers or not (layout invariance), and a near-lossless
    JPEG must agree with the PNG encoding of the same pixels — cross-
    format proof that the JPEG path yields real luma, not stub bytes."""
    from large_csv_etl_spark.multimodal import ahash_payloads

    img = _gradient()  # 32x24 gray
    import numpy as np

    plane = np.array(img, np.int64)
    jb_plain, _ = _write_jpeg({1: plane}, 32, 24, {1: (1, 1)})
    jb_rst, _ = _write_jpeg({1: plane}, 32, 24, {1: (1, 1)}, restart=2)
    png = _write_png_gray(img, 0)
    df = spark.createDataFrame(
        [(1, bytearray(jb_plain)), (2, bytearray(jb_rst)),
         (3, bytearray(png))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in ahash_payloads(df, stub=False).collect()}
    assert out[1].ahash == out[2].ahash, "restart layout changed the hash"
    assert out[1].ahash == out[3].ahash, "JPEG luma disagrees with PNG gray"
    assert (out[1].width, out[1].height) == (32, 24)


def test_phash_jpeg_real_decode(spark):
    """pHash through the JPEG real-decode path: bitstream-layout
    invariant, and distinct from a structurally different image."""
    from large_csv_etl_spark.multimodal import phash_payloads

    import numpy as np

    img = _gradient()
    plane = np.array(img, np.int64)
    inverted = 255 - plane
    jb_a, _ = _write_jpeg({1: plane}, 32, 24, {1: (1, 1)})
    jb_b, _ = _write_jpeg({1: plane}, 32, 24, {1: (1, 1)}, restart=1)
    jb_inv, _ = _write_jpeg({1: inverted}, 32, 24, {1: (1, 1)})
    df = spark.createDataFrame(
        [(1, bytearray(jb_a)), (2, bytearray(jb_b)), (3, bytearray(jb_inv))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r.phash for r in phash_payloads(df, stub=False).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
