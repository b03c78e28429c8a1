"""Multimodal column plumbing (§2b last row): opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions.

The design at 100 TB: media bytes ride as a BinaryType column next to a
metadata struct; decode / feature-extract / resize run as ``mapInPandas``
over Arrow batches (one Python roundtrip per batch, not per row), and the
Spark-side contract — schema, partitioning, batch shape — is identical
whether the inner decoder is PIL/ffmpeg or a stub. The image/audio
libraries are NOT in this container, so the real-decode paths carry
vendored pure-stdlib+numpy decoders for the two dominant training-corpus
image formats — PNG (full scanline defiltering) and baseline JPEG (full
Huffman entropy decode + dequant/IDCT of the luma plane,
``_make_jpeg_decoder``) — with Pillow taking over when installed; only
progressive/arithmetic/12-bit JPEG and the exotic formats remain behind
the fail-fast NotImplementedError gate. The deterministic stub remains
the oracle-graded fixture path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried next to every payload
META_SCHEMA = "struct<mime:string,source:string,n_bytes:bigint>"

DECODED_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, feature_hash long"
)


def _make_jpeg_decoder():
    """Build the vendored pure-stdlib+numpy baseline-JPEG decoder.

    Returned as a FACTORY product (not a module-level function) so the
    call sites can capture the closure into their mapInPandas functions:
    cloudpickle serializes ``<locals>`` closures BY VALUE, which is what
    lets the decoder execute on workers that cannot import
    ``large_csv_etl_spark`` (same rationale as the nested PNG decoders).

    Scope — the public ITU T.81 baseline process, everything a camera /
    ``cjpeg`` / Pillow default-save emits: SOF0 and SOF1 (extended
    sequential Huffman, identical decode path at 8-bit), multi-table
    DQT/DHT segments, arbitrary sampling factors (4:4:4, 4:2:2, 4:2:0),
    restart intervals (DRI + RSTn), single interleaved scan or a
    single-component non-interleaved scan, 0xFF00 byte-unstuffing.
    Unsupported-by-design (Pillow's job, fail-fast with the actionable
    gate message): progressive (SOF2), lossless/hierarchical, arithmetic
    coding, 12-bit precision — those raise NotImplementedError;
    CORRUPTION (bad sync, truncated entropy stream, invalid Huffman
    code, AC index overflow) raises ValueError so a broken payload is
    never misreported as an environment gate.

    ``jpeg_decode(b, want_pixels)`` returns
    ``(width, height, n_components, y_plane | None)`` where ``y_plane``
    is the reconstructed LUMA channel as a 2-D int64 array in 0..255 —
    the grayscale the perceptual hashers consume (JPEG's Y is already
    the BT.601 luma, so no chroma upsampling / color conversion is
    needed for the gray path; chroma blocks are still entropy-decoded
    to keep the bitstream walk honest). With ``want_pixels=False`` the
    full entropy decode still runs (every MCU Huffman-walked, restart
    markers verified) — a real decode, not a header peek — but skips
    dequant/IDCT.
    """

    def jpeg_decode(b, want_pixels=True):
        import numpy as np

        if len(b) < 4 or b[0:2] != b"\xff\xd8":
            raise ValueError("not a JPEG stream")
        # zigzag index k -> natural (row-major) index, public T.81 layout
        zz = np.array(
            [
                0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
                12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
                28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
                37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
                54, 47, 55, 62, 63,
            ],
            dtype=np.int64,
        )
        qt: dict = {}
        huff: dict = {}
        frame = None
        restart_interval = 0
        scan = None
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                raise ValueError("JPEG marker sync lost")
            m = b[i + 1]
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            if m == 0xD9:
                break
            if i + 4 > len(b):
                raise ValueError("truncated JPEG segment header")
            seg_len = (b[i + 2] << 8) | b[i + 3]
            seg = b[i + 4 : i + 2 + seg_len]
            nxt = i + 2 + seg_len
            if m == 0xDB:  # DQT, possibly several tables per segment
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    if pq == 0:
                        qt[tq] = np.frombuffer(
                            seg[p : p + 64], np.uint8
                        ).astype(np.int64)
                        p += 64
                    else:  # 16-bit table (rare, legal in SOF1)
                        qt[tq] = np.frombuffer(
                            seg[p : p + 128], ">u2"
                        ).astype(np.int64)
                        p += 128
            elif m == 0xC4:  # DHT, canonical code construction
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    counts = seg[p + 1 : p + 17]
                    p += 17
                    table = {}
                    code = 0
                    for size in range(1, 17):
                        for _ in range(counts[size - 1]):
                            table[(size, code)] = seg[p]
                            p += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = table
            elif m in (0xC0, 0xC1):  # baseline / extended sequential
                prec = seg[0]
                if prec != 8:
                    raise NotImplementedError(
                        f"{prec}-bit JPEG requires Pillow (baseline "
                        "decoder handles 8-bit only)"
                    )
                h = (seg[1] << 8) | seg[2]
                w = (seg[3] << 8) | seg[4]
                nc = seg[5]
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
                frame = (w, h, comps)
            elif m == 0xC2:
                raise NotImplementedError(
                    "progressive JPEG (SOF2) requires Pillow"
                )
            elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                       0xCE, 0xCF):
                raise NotImplementedError(
                    f"JPEG frame type 0x{m:02x} (lossless/hierarchical/"
                    "arithmetic) requires Pillow"
                )
            elif m == 0xDD:
                restart_interval = (seg[0] << 8) | seg[1]
            elif m == 0xDA:
                ns = seg[0]
                scomps = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                scan = (scomps, nxt)
                break  # entropy-coded data follows
            i = nxt
        if frame is None or scan is None:
            raise ValueError("malformed JPEG: missing SOF or SOS")
        w, h, comps = frame
        scomps, rpos = scan
        by_id = {c[0]: c for c in comps}
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)

        data = b
        bitbuf = 0
        bitcnt = 0

        def readbit():
            nonlocal rpos, bitbuf, bitcnt
            if bitcnt == 0:
                if rpos >= len(data):
                    raise ValueError("JPEG entropy stream truncated")
                byte = data[rpos]
                rpos += 1
                if byte == 0xFF:
                    if rpos >= len(data):
                        raise ValueError("JPEG entropy stream truncated")
                    if data[rpos] == 0x00:
                        rpos += 1  # stuffed byte
                    else:
                        raise ValueError(
                            "unexpected marker inside JPEG entropy data"
                        )
                bitbuf = byte
                bitcnt = 8
            bitcnt -= 1
            return (bitbuf >> bitcnt) & 1

        def expect_restart():
            nonlocal rpos, bitcnt
            bitcnt = 0  # byte-align, discard pad bits
            if (
                rpos + 2 > len(data)
                or data[rpos] != 0xFF
                or not 0xD0 <= data[rpos + 1] <= 0xD7
            ):
                raise ValueError("expected JPEG restart marker")
            rpos += 2

        def decode_huff(table):
            code = 0
            for size in range(1, 17):
                code = (code << 1) | readbit()
                sym = table.get((size, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid JPEG Huffman code")

        def receive_extend(ssss):
            if ssss == 0:
                return 0
            v = 0
            for _ in range(ssss):
                v = (v << 1) | readbit()
            if v < (1 << (ssss - 1)):
                v -= (1 << ssss) - 1
            return v

        def decode_block(dctab, actab, coefs):
            # coefs: zigzag-order int64[64] scratch, zeroed by caller
            diff = receive_extend(decode_huff(dctab))
            coefs[0] = diff
            k = 1
            while k < 64:
                rs = decode_huff(actab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("JPEG AC coefficient index overflow")
                coefs[k] = receive_extend(s)
                k += 1
            return diff

        # IDCT basis: pixels = A @ F @ A.T (F natural order, row =
        # vertical frequency) — same float64 expression the conformance
        # tests reproduce, so decode results are bit-deterministic.
        n8 = np.arange(8)
        basis = np.cos((2 * n8[:, None] + 1) * n8[None, :] * np.pi / 16)
        alpha = np.full(8, 0.5)
        alpha[0] = np.sqrt(0.125)
        basis = basis * alpha[None, :]

        ycid, yhc, yvc, ytq = comps[0]
        # luma plane at the component's own resolution (full res when
        # comp 0 carries hmax x vmax, the universal case)
        ycw = -(-w * yhc // hmax)
        ych = -(-h * yvc // vmax)
        ypad = None
        if want_pixels:
            if ytq not in qt:
                raise ValueError("missing quantization table for luma")

        dcpred = {c[0]: 0 for c in comps}
        coefs = np.zeros(64, dtype=np.int64)
        natural = np.zeros(64, dtype=np.float64)

        def reconstruct(bx0, by0):
            # dequant + de-zigzag + IDCT + level shift into ypad
            natural[:] = 0.0
            natural[zz] = coefs * qt[ytq]
            natural[0] = dcpred[ycid] * qt[ytq][0]
            px = basis @ natural.reshape(8, 8) @ basis.T
            blk = np.clip(np.rint(px) + 128, 0, 255).astype(np.int64)
            ypad[by0 : by0 + 8, bx0 : bx0 + 8] = blk

        if len(scomps) == 1:
            # non-interleaved scan: MCU is ONE data unit of that comp
            cs, td, ta = scomps[0]
            cid, hc, vc, tq = by_id[cs]
            cw = -(-w * hc // hmax)
            ch = -(-h * vc // vmax)
            bxs, bys = -(-cw // 8), -(-ch // 8)
            if want_pixels and cid == ycid:
                ypad = np.zeros((bys * 8, bxs * 8), dtype=np.int64)
            mcount = 0
            for by in range(bys):
                for bx in range(bxs):
                    if restart_interval and mcount and (
                        mcount % restart_interval == 0
                    ):
                        expect_restart()
                        dcpred[cid] = 0
                    coefs[:] = 0
                    decode_block(huff[(0, td)], huff[(1, ta)], coefs)
                    dcpred[cid] += coefs[0]
                    if ypad is not None:
                        reconstruct(bx * 8, by * 8)
                    mcount += 1
        else:
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            if want_pixels:
                ypad = np.zeros(
                    (mcuy * yvc * 8, mcux * yhc * 8), dtype=np.int64
                )
            mcount = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcount and (
                        mcount % restart_interval == 0
                    ):
                        expect_restart()
                        for k in dcpred:
                            dcpred[k] = 0
                    for cs, td, ta in scomps:
                        cid, hc, vc, tq = by_id[cs]
                        for by in range(vc):
                            for bx in range(hc):
                                coefs[:] = 0
                                decode_block(
                                    huff[(0, td)], huff[(1, ta)], coefs
                                )
                                dcpred[cid] += coefs[0]
                                if ypad is not None and cid == ycid:
                                    reconstruct(
                                        (mx * yhc + bx) * 8,
                                        (my * yvc + by) * 8,
                                    )
                    mcount += 1

        ypix = ypad[:ych, :ycw] if ypad is not None else None
        return w, h, len(comps), ypix

    return jpeg_decode


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct). The fixture has
    no real media, so the utf-8 document bytes stand in as the opaque
    payload — the column types and plumbing are what is under test."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("source"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_payloads(df: DataFrame, stub: bool = True) -> DataFrame:
    """Decode every payload to (dims, channels, feature_hash) via
    mapInPandas — the real Spark-side shape of a media pipeline: Arrow
    batches in, vectorized work per batch, typed rows out.

    The decoder functions are defined INSIDE this function on purpose:
    cloudpickle then ships them by value to the Python workers. A
    module-level helper would be pickled as a reference to
    ``large_csv_etl_spark`` — which executors cannot import unless the
    package is on the workers' PYTHONPATH (true under pytest, not under an
    arbitrary driver harness).
    """

    def decode_png_pure(b: bytes) -> tuple[int, int, int]:
        # Vendored pure-stdlib PNG decode (zlib + struct): parses IHDR,
        # decompresses every IDAT chunk, and for the plain 8-bit
        # non-interlaced case verifies the pixel-stream length — a real
        # decode of the dominant training-corpus format, not a header
        # peek. Production clusters install Pillow (the branch above);
        # this keeps the real-decode path EXECUTABLE in minimal
        # containers and pins its conformance in pytest.
        import struct
        import zlib

        bands_by_color_type = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
        if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG stream")
        pos, width = 8, None
        height = bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(b):
            (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[
                pos + 4 : pos + 8
            ]
            data = b[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _, _, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if width is None or color_type not in bands_by_color_type:
            raise ValueError("malformed PNG header")
        raw = zlib.decompress(bytes(idat))
        bands = bands_by_color_type[color_type]
        if bit_depth == 8 and interlace == 0:
            expected = height * (1 + width * bands)  # +1 filter byte/row
            if len(raw) != expected:
                raise ValueError(
                    f"PNG pixel stream {len(raw)}B != expected {expected}B"
                )
        return width, height, bands

    def decode_real(payload: bytes) -> tuple[int, int, int]:
        # Real image decode: Pillow when available (production path, all
        # formats), else the vendored pure-stdlib PNG decoder or the
        # vendored baseline-JPEG decoder (full entropy walk — every MCU
        # Huffman-decoded and restart markers verified — not a header
        # peek). The import-try runs on the WORKER (this closure ships
        # by value); an unrecognized payload without Pillow fails with
        # the actionable message below rather than an opaque ImportError
        # mid-batch; progressive/arithmetic/12-bit JPEG raises its own
        # actionable NotImplementedError from the decoder.
        import io as _io

        b = bytes(payload)
        try:
            from PIL import Image
        except ImportError:
            if b[:2] == b"\xff\xd8":
                jw, jh, nc, _ = jpeg_decode(b, want_pixels=False)
                return jw, jh, nc
            try:
                return decode_png_pure(b)
            except ValueError as exc:
                raise NotImplementedError(
                    "decoding non-PNG/non-baseline-JPEG payloads requires "
                    "Pillow; install it or use the deterministic stub "
                    f"(decode_payloads(..., stub=True)): {exc}"
                ) from exc
        with Image.open(_io.BytesIO(b)) as im:
            return im.width, im.height, len(im.getbands())

    def decode_stub(payload: bytes) -> tuple[int, int, int]:
        # Deterministic fake: plausible dimensions from the byte length so
        # the full batch path is exercised (and oracle-checkable).
        n = len(payload)
        width = 16 + (n % 240)
        height = 16 + ((n // 7) % 240)
        return width, height, 3

    jpeg_decode = _make_jpeg_decoder()
    decode = decode_stub if stub else decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    # cheap content fingerprint, stand-in for an embedding
                    "feature_hash": [
                        int.from_bytes(bytes(p[:8]).ljust(8, b"\0"), "big")
                        >> 1
                        for p in pdf["payload"]
                    ],
                }
            )

    # gate deliberately NOT applied: the decode/resize stubs are ~0.2 s
    # serial at sf0.1 and the paired A/B showed the exchange + worker
    # fan-out costing MORE than it saves (0.60 -> 1.09 s wall,
    # 222 -> 1001 busy-jiffies); only the perceptual-hash passes are
    # heavy enough to amortize it (logs/r16/ab_setB.log)
    return df.mapInPandas(run, DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into fixed-stride
    "frames" (offset + slice) — pure JVM expressions, no Python. With real
    video this is the keyframe index pass that runs BEFORE any decoder."""
    n_frames = F.greatest(
        F.ceil(F.octet_length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col("payload"), i * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, scale_fp long"
)


def resize_payloads(df: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-fit resize planning in the SAME Arrow batch as decode — the
    shape of a real preprocessing stage (decode + resize in one Python
    roundtrip, no intermediate materialization). The stub computes output
    dimensions in integer fixed-point (micro-units) so the Python batch
    path is exactly reproducible by closed-form SQL: no float division
    anywhere, hence no engine-rounding to reconcile. A real pipeline
    swaps the two inner functions for PIL decode + Image.resize; the
    batch contract (schema, alignment, partitioning) does not change."""

    def decode_stub(payload: bytes) -> tuple[int, int]:
        n = len(payload)
        return 16 + (n % 240), 16 + ((n // 7) % 240)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                w, h = decode_stub(p)
                scale_fp = min(target * 1_000_000 // w, target * 1_000_000 // h)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        max(1, w * scale_fp // 1_000_000),
                        max(1, h * scale_fp // 1_000_000),
                        scale_fp,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_w", "out_h", "scale_fp"],
            )

    # same no-gate rationale as decode_payloads (trivial stub work)
    return df.mapInPandas(run, RESIZED_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash long, width int, height int"


def _parallelize_python_pass(df: DataFrame) -> DataFrame:
    """Gated repartition before a per-row Python (mapInPandas) pass — the
    dedup family's pattern applied to the media pipeline. The fixture's
    documents parquet is a single input split, so every payload otherwise
    lands in ONE task and the whole perceptual-hash/decode pass runs on
    one Python worker (measured: the pHash pass over the sf0.1 frame
    stream is ~4 s of single-thread numpy — the entirety of that query's
    wall above the bench floor). One round-robin exchange of the
    row-local payload rows restores full parallelism; at production
    scale the scan already has >= cores partitions and the gate never
    fires."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism // 2:
        df = df.repartition(sc.defaultParallelism)
    return df


def _gray_pixel_fn(stub: bool):
    """Build the payload->grayscale-pixel-array closure shared by the
    perceptual hashers. Everything is NESTED here so cloudpickle ships
    the returned closure BY VALUE to Python workers (a module-level
    helper would pickle as a large_csv_etl_spark reference, which an
    arbitrary driver harness's workers cannot import). stub=True reads
    the raw bytes as a synthetic 8-bit grayscale image (fixture path);
    stub=False decodes real pixels via Pillow, else the vendored
    stdlib PNG decoder with full scanline defiltering."""

    def png_gray_pixels(b: bytes):
        # parse IHDR/IDAT, zlib-decompress, undo per-row filters, reduce
        # to one grayscale channel — returns a 2-D uint8-valued int array
        import struct
        import zlib

        import numpy as np

        bands_by_color_type = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
        if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG stream")
        pos, width = 8, None
        height = bit_depth = color_type = interlace = None
        idat = bytearray()
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos : pos + 4])
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _, _, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if width is None or color_type not in bands_by_color_type:
            raise ValueError("malformed PNG header")
        if bit_depth != 8 or interlace != 0:
            raise ValueError("only 8-bit non-interlaced PNG supported here")
        bpp = bands_by_color_type[color_type]
        raw = zlib.decompress(bytes(idat))
        stride = 1 + width * bpp
        if len(raw) != height * stride:
            raise ValueError("PNG pixel stream length mismatch")
        out = np.zeros((height, width * bpp), dtype=np.int64)
        prev = np.zeros(width * bpp, dtype=np.int64)
        for y in range(height):
            row = raw[y * stride : (y + 1) * stride]
            ftype, line = row[0], np.frombuffer(row[1:], np.uint8).astype(
                np.int64
            )
            cur = line.copy()
            if ftype == 0:
                pass
            elif ftype == 1:  # Sub
                for i in range(bpp, len(cur)):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                cur = (cur + prev) & 0xFF
            elif ftype == 3:  # Average
                for i in range(len(cur)):
                    a = cur[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(len(cur)):
                    a = cur[i - bpp] if i >= bpp else 0
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + prev[i] - c
                    pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        prev[i] if pb <= pc else c
                    )
                    cur[i] = (cur[i] + pred) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter {ftype}")
            out[y] = cur
            prev = cur
        px = out.reshape(height, width, bpp)
        if bpp == 1:
            return px[:, :, 0]
        if bpp == 2:  # gray+alpha: gray channel
            return px[:, :, 0]
        # rgb(+alpha): integer mean of the 3 color channels
        return (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3

    def pixels_stub(b: bytes):
        import numpy as np

        n = len(b)
        width = 16 + (n % 240)
        height = 16 + ((n // 7) % 240)
        need = width * height
        buf = np.frombuffer(bytes(b), np.uint8)
        if buf.size == 0:
            buf = np.zeros(1, np.uint8)
        reps = -(-need // buf.size)
        return (
            np.tile(buf, reps)[:need].astype(np.int64).reshape(height, width)
        )

    def pixels_real(b: bytes):
        # Pillow when installed; else vendored decoders by magic bytes.
        # The JPEG gray plane is the decoded LUMA channel (Y IS the
        # BT.601 gray, so no chroma path is needed for the hashers); the
        # PNG gray is the integer channel mean — both are deterministic,
        # and each format is hash-compared only against itself in the
        # invariance tests.
        import io as _io

        import numpy as np

        data = bytes(b)
        try:
            from PIL import Image
        except ImportError:
            if data[:2] == b"\xff\xd8":
                return jpeg_decode(data, want_pixels=True)[3]
            return png_gray_pixels(data)
        with Image.open(_io.BytesIO(data)) as im:
            return np.asarray(im.convert("L"), dtype=np.int64)

    jpeg_decode = _make_jpeg_decoder()
    get_pixels = pixels_stub if stub else pixels_real

    return get_pixels


def ahash_payloads(df: DataFrame, stub: bool = True) -> DataFrame:
    """Perceptual average-hash (aHash) per payload — the image near-dup
    primitive: downscale to an 8x8 grid of block means, threshold each
    block against the grid mean, pack the 64 bits into one BIGINT.
    Identical images hash equal regardless of their PNG filter-type
    encoding choices; small pixel perturbations flip few bits, so
    Hamming distance on the hash is a perceptual similarity. All
    arithmetic is integer (block sums via an exact integral image,
    floor-divided means), so the hash is bit-deterministic across runs,
    partitionings, and workers.

    ``stub=True`` (fixture path — no real media in the container)
    interprets the raw payload bytes as an 8-bit grayscale image with
    the same synthetic dims as ``decode_payloads``'s stub; the plumbing
    — Arrow batches, numpy block reduction, 64-bit packing — is the
    production shape. ``stub=False`` decodes real pixels: Pillow when
    installed, else the vendored stdlib PNG path extended with full
    scanline DEFILTERING (None/Sub/Up/Average/Paeth, the public PNG
    spec algorithms) and integer grayscale reduction; conformance and
    filter-invariance are pinned in tests/test_multimodal.py.
    """

    get_pixels = _gray_pixel_fn(stub)

    def ahash64(px) -> int:
        import numpy as np

        h, w = px.shape
        # exact integral image -> exact block sums for the 8x8 grid
        integ = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(px, axis=0), axis=1, out=integ[1:, 1:])
        ys = (np.arange(9, dtype=np.int64) * h) // 8
        xs = (np.arange(9, dtype=np.int64) * w) // 8
        sums = (
            integ[ys[1:], :][:, xs[1:]]
            - integ[ys[:-1], :][:, xs[1:]]
            - integ[ys[1:], :][:, xs[:-1]]
            + integ[ys[:-1], :][:, xs[:-1]]
        )
        areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
        means = sums // areas  # floor: deterministic integer means
        thresh = int(means.sum()) // 64
        bits = (means > thresh).flatten()
        v = 0
        for bit in bits:
            v = (v << 1) | int(bit)
        # wrap to signed 64-bit (BIGINT)
        return v - (1 << 64) if v >= (1 << 63) else v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, widths, heights = [], [], []
            for p in pdf["payload"]:
                px = get_pixels(p)
                hashes.append(ahash64(px))
                heights.append(px.shape[0])
                widths.append(px.shape[1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": pd.Series(hashes, dtype="int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return _parallelize_python_pass(df).mapInPandas(run, AHASH_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash long, width int, height int"


def phash_payloads(df: DataFrame, stub: bool = True) -> DataFrame:
    """Perceptual DCT hash (pHash) per payload — the frequency-domain
    sibling of ``ahash_payloads``: downscale to an exact 32x32 grid of
    integer block means, 2-D DCT-II (orthonormal, explicit float64
    matrix products — no FFT library), keep the 8x8 low-frequency
    corner, threshold each coefficient against the median of the 63
    non-DC coefficients, pack 64 bits into one BIGINT. pHash survives
    brightness/contrast shifts that flip aHash bits (they rescale
    coefficients but move the median with them), which is why image
    dedup stacks run both. The 32x32 reduction is the same exact
    integral-image arithmetic as aHash; the only floats are the fixed
    32x32x32 DCT products, identical on every worker (single-threaded
    numpy dot on fixed shapes). Real-pixels path shares the Pillow /
    vendored-PNG decoder via ``_gray_pixel_fn``."""

    def _dct_basis():
        import numpy as np

        g = 32
        k = np.arange(g, dtype=np.float64)
        # orthonormal DCT-II basis — fixed 32x32, built ONCE per worker
        # call instead of per frame (the per-frame rebuild was ~15% of
        # the pHash pass at sf0.1)
        c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * g))
        c *= np.sqrt(2.0 / g)
        c[0, :] = np.sqrt(1.0 / g)
        return c

    def phash64(px, c) -> int:
        import numpy as np

        h, w = px.shape
        g = 32
        integ = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(px, axis=0), axis=1, out=integ[1:, 1:])
        ys = (np.arange(g + 1, dtype=np.int64) * h) // g
        xs = (np.arange(g + 1, dtype=np.int64) * w) // g
        # degenerate dims (<32 px): clamp duplicate cut points upward so
        # every block is non-empty
        ys = np.maximum(ys, np.arange(g + 1))
        xs = np.maximum(xs, np.arange(g + 1))
        ys = np.minimum(ys, h) if h >= g + 1 else np.arange(g + 1) % (h + 1)
        xs = np.minimum(xs, w) if w >= g + 1 else np.arange(g + 1) % (w + 1)
        sums = (
            integ[ys[1:], :][:, xs[1:]]
            - integ[ys[:-1], :][:, xs[1:]]
            - integ[ys[1:], :][:, xs[:-1]]
            + integ[ys[:-1], :][:, xs[:-1]]
        )
        areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
        areas = np.maximum(areas, 1)
        means = (sums // areas).astype(np.float64)
        coef = c @ means @ c.T
        low = coef[:8, :8].flatten()
        med = float(np.median(low[1:]))
        bits = low > med
        v = 0
        for bit in bits:
            v = (v << 1) | int(bit)
        return v - (1 << 64) if v >= (1 << 63) else v

    get_pixels = _gray_pixel_fn(stub)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = _dct_basis()
        for pdf in batches:
            hashes, widths, heights = [], [], []
            for p in pdf["payload"]:
                px = get_pixels(p)
                hashes.append(phash64(px, c))
                heights.append(px.shape[0])
                widths.append(px.shape[1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pd.Series(hashes, dtype="int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return _parallelize_python_pass(df).mapInPandas(run, PHASH_SCHEMA)
