"""Bit-identity prototype: vectorized stub ahash/phash vs the scalar code.

Builds the exact frame stream sample_frames produces over the sf docs
(64-byte slices, last slice short, min 1 frame incl. empty payload),
hashes every frame with (a) the current per-frame scalar functions and
(b) the grouped vectorized implementation, and compares bit-for-bit.
"""
import sys

import numpy as np
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


# --- current scalar implementations (copied verbatim semantics) ----------
def pixels_stub(b: bytes):
    n = len(b)
    width = 16 + (n % 240)
    height = 16 + ((n // 7) % 240)
    need = width * height
    buf = np.frombuffer(bytes(b), np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, np.uint8)
    reps = -(-need // buf.size)
    return np.tile(buf, reps)[:need].astype(np.int64).reshape(height, width)


def ahash64(px) -> int:
    h, w = px.shape
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
    means = sums // areas
    thresh = int(means.sum()) // 64
    bits = (means > thresh).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _dct_basis():
    g = 32
    k = np.arange(g, dtype=np.float64)
    c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * g))
    c *= np.sqrt(2.0 / g)
    c[0, :] = np.sqrt(1.0 / g)
    return c


def phash64(px, c) -> int:
    h, w = px.shape
    g = 32
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(px, axis=0), axis=1, out=integ[1:, 1:])
    ys = (np.arange(g + 1, dtype=np.int64) * h) // g
    xs = (np.arange(g + 1, dtype=np.int64) * w) // g
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


# --- vectorized grouped implementations ----------------------------------
def stub_group_pixels(bufs: list[bytes]):
    """All payloads here share one length n -> one (m, h, w) stack."""
    n = len(bufs[0])
    m = len(bufs)
    width = 16 + (n % 240)
    height = 16 + ((n // 7) % 240)
    need = width * height
    if n == 0:
        flat = np.zeros((m, 1), np.uint8)
    else:
        flat = np.frombuffer(b"".join(bufs), np.uint8).reshape(m, n)
    reps = -(-need // flat.shape[1])
    px = np.tile(flat, (1, reps))[:, :need].astype(np.int64)
    return px.reshape(m, height, width), height, width


def _grid(h, w, g):
    ys = (np.arange(g + 1, dtype=np.int64) * h) // g
    xs = (np.arange(g + 1, dtype=np.int64) * w) // g
    if g == 32:  # phash degenerate-dims clamps
        ys = np.maximum(ys, np.arange(g + 1))
        xs = np.maximum(xs, np.arange(g + 1))
        ys = np.minimum(ys, h) if h >= g + 1 else np.arange(g + 1) % (h + 1)
        xs = np.minimum(xs, w) if w >= g + 1 else np.arange(g + 1) % (w + 1)
    return ys, xs


def block_means_batch(px3, g):
    m, h, w = px3.shape
    integ = np.zeros((m, h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(px3, axis=1), axis=2, out=integ[:, 1:, 1:])
    ys, xs = _grid(h, w, g)
    a = integ[:, ys[1:], :][:, :, xs[1:]]
    b = integ[:, ys[:-1], :][:, :, xs[1:]]
    c_ = integ[:, ys[1:], :][:, :, xs[:-1]]
    d = integ[:, ys[:-1], :][:, :, xs[:-1]]
    sums = a - b - c_ + d
    areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    if g == 32:
        areas = np.maximum(areas, 1)
    return sums // areas  # (m, g, g)


_PACK_W = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def pack_bits(bits2d):
    """bits2d (m, 64) bool, MSB-first -> signed int64 exactly like the
    scalar shift loop + two's-complement wrap."""
    v = (bits2d.astype(np.uint64) * _PACK_W).sum(axis=1, dtype=np.uint64)
    return v.view(np.int64) if False else v.astype(np.int64, casting="unsafe")


def ahash_group(bufs):
    px3, h, w = stub_group_pixels(bufs)
    means = block_means_batch(px3, 8)  # (m,8,8)
    thresh = means.reshape(len(bufs), 64).sum(axis=1) // 64
    bits = means.reshape(len(bufs), 64) > thresh[:, None]
    return pack_bits(bits)


def phash_group(bufs, c, batched_dct=True):
    px3, h, w = stub_group_pixels(bufs)
    means = block_means_batch(px3, 32).astype(np.float64)  # (m,32,32)
    if batched_dct:
        coef = np.matmul(np.matmul(c, means), c.T)
    else:
        coef = np.stack([c @ means[i] @ c.T for i in range(means.shape[0])])
    low = coef[:, :8, :8].reshape(len(bufs), 64)
    med = np.median(low[:, 1:], axis=1)
    bits = low > med[:, None]
    return pack_bits(bits)


# --- build frame stream and compare --------------------------------------
t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
frames = []
for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
    b = (txt or "").encode("utf-8")
    nf = max(-(-len(b) // 64), 1)
    for i in range(nf):
        frames.append((did * 10000 + i, b[i * 64 : (i + 1) * 64]))
print("frames:", len(frames))

import time

c = _dct_basis()
t0 = time.perf_counter()
scalar_a = [ahash64(pixels_stub(b)) for _, b in frames]
t1 = time.perf_counter()
scalar_p = [phash64(pixels_stub(b), c) for _, b in frames]
t2 = time.perf_counter()
print(f"scalar ahash {t1-t0:.2f}s, phash {t2-t1:.2f}s")

# grouped
from collections import defaultdict

groups = defaultdict(list)
for idx, (_, b) in enumerate(frames):
    groups[len(b)].append(idx)

vec_a = np.zeros(len(frames), np.int64)
vec_p = np.zeros(len(frames), np.int64)
vec_p_loop = np.zeros(len(frames), np.int64)
t3 = time.perf_counter()
for n, idxs in groups.items():
    bufs = [frames[i][1] for i in idxs]
    vec_a[idxs] = ahash_group(bufs)
t4 = time.perf_counter()
for n, idxs in groups.items():
    bufs = [frames[i][1] for i in idxs]
    vec_p[idxs] = phash_group(bufs, c, batched_dct=True)
t5 = time.perf_counter()
for n, idxs in groups.items():
    bufs = [frames[i][1] for i in idxs]
    vec_p_loop[idxs] = phash_group(bufs, c, batched_dct=False)
t6 = time.perf_counter()
print(f"vector ahash {t4-t3:.2f}s, phash(batched dct) {t5-t4:.2f}s, phash(loop dct) {t6-t5:.2f}s")

sa = np.array(scalar_a, np.int64)
sp = np.array(scalar_p, np.int64)
print("ahash identical:", bool((sa == vec_a).all()))
print("phash batched-dct identical:", bool((sp == vec_p).all()), "mismatches:", int((sp != vec_p).sum()))
print("phash loop-dct identical:", bool((sp == vec_p_loop).all()), "mismatches:", int((sp != vec_p_loop).sum()))
