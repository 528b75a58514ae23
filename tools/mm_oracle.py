#!/usr/bin/env python3
"""Independent multimodal oracle for the mm_* correctness rows.

The Spark side (graft.pipeline.Multimodal) generates media payloads whose
CONTENT is a seeded LCG (MediaCodecs.byteStream), encodes them with real
JVM codecs (javax.imageio PNG, javax.sound.sampled WAV, a length-prefixed
frame container), then decodes them back and computes intensity features.
PNG and 16-bit PCM WAV are lossless, so this script predicts every decoded
pixel/sample in pure Python by mirroring the LCG, and emits pinned parquet
the driver hash-compares — a second engine agreeing bit-for-bit.

It also cross-checks the codecs themselves, in both directions:
  * decodes the JVM-encoded fixtures in tools/mm_fixtures/jvm_* with its
    own pure-Python PNG/WAV readers (no shared code) and asserts the LCG
    content — catches JVM ENCODE bugs;
  * writes Python-encoded fixtures tools/mm_fixtures/py_* that
    MediaCodecsSpec decodes on the JVM — catches JVM DECODE bugs.

Usage: mm_oracle.py <sfDir> <outDir>
Emits <outDir>/{mm_features,mm_frame_sample,mm_resize,mm_phash,
mm_phash_pairs}.parquet.
"""
import math
import os
import struct
import sys
import wave
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

MASK = (1 << 64) - 1
BIAS = 0.500137  # graft.ts.Round6


def r6(x):
    return math.floor(x * 1e6 + BIAS) / 1e6


def byte_stream(seed, n):
    """Mirror of MediaCodecs.byteStream: Knuth MMIX LCG, upper bits."""
    out = []
    x = seed & MASK
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & MASK
        out.append((x >> 33) & 0xFF)
    return out


def frame_seed(doc_id, frame):
    return doc_id * 100003 + frame


# ---------------- pure-Python PNG codec (grayscale 8-bit) ----------------

def png_encode(width, height, px):
    """Minimal grayscale-8 PNG writer (filter 0 rows)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(px[y * width:(y + 1) * width]) for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def png_decode(data):
    """Minimal grayscale-8 PNG reader: all 5 filter types, bpp=1."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, width, height, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 0, f"not grayscale-8: {depth}/{ctype}"
            assert body[10:13] == b"\x00\x00\x00", "unsupported compression"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width
    px, prev = [], [0] * stride
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = list(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        cur = []
        for x in range(stride):
            a = cur[x - 1] if x > 0 else 0          # left
            b = prev[x]                              # up
            c = prev[x - 1] if x > 0 else 0          # up-left
            v = line[x]
            if f == 1:
                v += a
            elif f == 2:
                v += b
            elif f == 3:
                v += (a + b) // 2
            elif f == 4:  # Paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                v += a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            else:
                assert f == 0, f"bad filter {f}"
            cur.append(v & 0xFF)
        px.extend(cur)
        prev = cur
    return width, height, px


# --------------------------- WAV via stdlib ------------------------------

def wav_encode(path_or_buf, rate, samples):
    w = wave.open(path_or_buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    w.close()


def wav_decode(path):
    w = wave.open(path, "rb")
    assert w.getnchannels() == 1 and w.getsampwidth() == 2
    n = w.getnframes()
    samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    rate = w.getframerate()
    w.close()
    return rate, samples


# ------------------- GFV1 frame container (video) ------------------------

def video_decode(data):
    assert data[:4] == b"GFV1", "not a GFV1 payload"
    (n,) = struct.unpack(">i", data[4:8])
    pos, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">i", data[pos:pos + 4])
        frames.append(png_decode(data[pos + 4:pos + 4 + ln]))
        pos += 4 + ln
    return frames


# ----------------------- synthetic media mirror --------------------------

def media_intensities(doc_id):
    """(media_type, [0..255 intensities]) mirroring Multimodal."""
    m = doc_id % 3
    if m == 1:
        n = 2048 + (doc_id % 7) * 512
        # pcm = (b-128)*256; intensity = (pcm >> 8) + 128 == b exactly
        return "audio", byte_stream(doc_id, n)
    if m == 2:
        nf = 8 + (doc_id % 5) * 4
        px = []
        for f in range(nf):
            px.extend(byte_stream(frame_seed(doc_id, f), 32 * 32))
        return "video", px
    w = 64 + (doc_id % 4) * 32
    h = 64 + (doc_id % 3) * 32
    return "image", byte_stream(doc_id, w * h)


def features_row(doc_id):
    mt, px = media_intensities(doc_id)
    hist = [0] * 16
    s = 0
    for v in px:
        hist[v >> 4] += 1
        s += v
    n = max(len(px), 1)
    return (doc_id, mt, len(px), r6(s / (255.0 * n)),
            r6(hist[0] / n), r6(hist[5] / n), r6(hist[15] / n))


def frame_rows(doc_id, stride=4):
    if doc_id % 3 != 2:
        return []
    nf = 8 + (doc_id % 5) * 4
    rows = []
    for f in range(0, nf, stride):
        px = byte_stream(frame_seed(doc_id, f), 32 * 32)
        rows.append((doc_id, f, 32, 32, r6(sum(px) / (255.0 * len(px)))))
    return rows


def ahash64(w, h, px):
    """Mirror of MediaCodecs.aHash64: 8x8 cell means vs global mean,
    all-integer comparison, floor cell boundaries, row-major bits."""
    total = sum(px)
    wh = w * h
    hv = 0
    for cy in range(8):
        y0, y1 = cy * h // 8, (cy + 1) * h // 8
        for cx in range(8):
            x0, x1 = cx * w // 8, (cx + 1) * w // 8
            s = sum(px[y * w + x] for y in range(y0, y1)
                    for x in range(x0, x1))
            n = (y1 - y0) * (x1 - x0)
            if s * wh >= total * n:
                hv |= 1 << (cy * 8 + cx)
    return hv


PHASH_TWIN_OFFSET = 1000000000
PHASH_PERTURB_N, PHASH_PERTURB_DELTA = 4, 16
PHASH_MAX_DIST = 7


def phash_rows(ids):
    """(doc_id, unsigned ahash) for every image doc AND its perturbed
    twin — mirrors syntheticMedia + perturbImages + imageHashes."""
    rows = []
    for i in ids:
        if i % 3 != 0:
            continue
        w = 64 + (i % 4) * 32
        h = 64 + (i % 3) * 32
        px = byte_stream(i, w * h)
        rows.append((i, ahash64(w, h, px)))
        tw = list(px)
        for j in range(min(PHASH_PERTURB_N, len(tw))):
            tw[j] = (tw[j] + PHASH_PERTURB_DELTA) & 0xFF
        rows.append((i + PHASH_TWIN_OFFSET, ahash64(w, h, tw)))
    return sorted(rows)


def phash_pairs(rows):
    """Brute-force Hamming <= PHASH_MAX_DIST — EXACTLY the banded
    Spark output, because <= 7 flipped bits always leave one of the 8
    one-byte bands clean (pigeonhole)."""
    out = []
    for ai in range(len(rows)):
        for bi in range(ai + 1, len(rows)):
            (da, ha), (db, hb) = rows[ai], rows[bi]
            d = bin(ha ^ hb).count("1")
            if d <= PHASH_MAX_DIST:
                out.append((min(da, db), max(da, db), d))
    return sorted(out)


def signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def ehash64(vals):
    """Mirror of MediaCodecs.eHash64: 64 floor windows over a 1-D
    intensity stream, window mean vs global mean, ties set."""
    n = len(vals)
    total = sum(vals)
    hv = 0
    for w in range(64):
        i0, i1 = w * n // 64, (w + 1) * n // 64
        s = sum(vals[i0:i1])
        if s * n >= total * (i1 - i0):
            hv |= 1 << w
    return hv


def afp_rows(ids):
    """(doc_id, unsigned envelope hash) for audio docs + perturbed
    twins — audio intensities ARE the LCG bytes, and the perturbation
    maps to (b + delta) & 0xFF on them exactly."""
    rows = []
    for i in ids:
        if i % 3 != 1:
            continue
        n = 2048 + (i % 7) * 512
        b = byte_stream(i, n)
        rows.append((i, ehash64(b)))
        tw = list(b)
        for j in range(min(PHASH_PERTURB_N, len(tw))):
            tw[j] = (tw[j] + PHASH_PERTURB_DELTA) & 0xFF
        rows.append((i + PHASH_TWIN_OFFSET, ehash64(tw)))
    return sorted(rows)


VIDEO_MIN_SHARED = 7


def video_pair_rows(ids):
    """(doc_a, doc_b, n_shared) pairs of videos sharing >=
    VIDEO_MIN_SHARED distinct frame aHashes; twins perturb frame 0."""
    fsets = []
    for i in ids:
        if i % 3 != 2:
            continue
        nf = 8 + (i % 5) * 4
        hashes = []
        for f in range(nf):
            px = byte_stream(frame_seed(i, f), 32 * 32)
            hashes.append(ahash64(32, 32, px))
            if f == 0:
                tw = list(px)
                for j in range(min(PHASH_PERTURB_N, len(tw))):
                    tw[j] = (tw[j] + PHASH_PERTURB_DELTA) & 0xFF
                tw0 = ahash64(32, 32, tw)
        fsets.append((i, set(hashes)))
        fsets.append((i + PHASH_TWIN_OFFSET, {tw0} | set(hashes[1:])))
    out = []
    for ai in range(len(fsets)):
        for bi in range(ai + 1, len(fsets)):
            (da, sa), (db, sb) = fsets[ai], fsets[bi]
            n = len(sa & sb)
            if n >= VIDEO_MIN_SHARED:
                out.append((min(da, db), max(da, db), n))
    return sorted(out)


def resize_row(doc_id):
    if doc_id % 3 != 0:
        return None
    w = 64 + (doc_id % 4) * 32
    h = 64 + (doc_id % 3) * 32
    px = byte_stream(doc_id, w * h)
    ow, oh = w // 2, h // 2
    s = 0
    for y in range(oh):
        for x in range(ow):
            r0 = 2 * y * w + 2 * x
            r1 = r0 + w
            s += (px[r0] + px[r0 + 1] + px[r1] + px[r1 + 1]) // 4
    return (doc_id, w, h, ow, oh, r6(s / (255.0 * ow * oh)))


# -------------------- fixture cross-checks (both ways) --------------------

PNG_W, PNG_H, PNG_SEED = 8, 6, 42        # MediaFixtures constants
WAV_N, WAV_RATE, WAV_SEED = 256, 16000, 43
VID_FRAMES, VID_SIDE, VID_DOC = 3, 4, 7


def check_jvm_fixtures(fix_dir):
    p = os.path.join(fix_dir, "jvm_gray.png")
    if not os.path.exists(p):
        print("NOTE: jvm fixtures absent, skipping decode cross-check")
        return
    w, h, px = png_decode(open(p, "rb").read())
    assert (w, h) == (PNG_W, PNG_H) and px == byte_stream(PNG_SEED, w * h), \
        "JVM PNG encode does not round-trip through the Python decoder"
    rate, samples = wav_decode(os.path.join(fix_dir, "jvm_pcm.wav"))
    want = [(b - 128) * 256 for b in byte_stream(WAV_SEED, WAV_N)]
    assert rate == WAV_RATE and samples == want, \
        "JVM WAV encode does not round-trip through the Python decoder"
    frames = video_decode(open(os.path.join(fix_dir, "jvm_frames.gfv"), "rb").read())
    assert len(frames) == VID_FRAMES
    for f, (w, h, px) in enumerate(frames):
        assert (w, h) == (VID_SIDE, VID_SIDE)
        assert px == byte_stream(frame_seed(VID_DOC, f), VID_SIDE * VID_SIDE), \
            f"JVM video frame {f} content mismatch"
    print("jvm fixture decode cross-check: OK")


def write_py_fixtures(fix_dir):
    os.makedirs(fix_dir, exist_ok=True)
    with open(os.path.join(fix_dir, "py_gray.png"), "wb") as f:
        f.write(png_encode(PNG_W, PNG_H, byte_stream(PNG_SEED, PNG_W * PNG_H)))
    wav_encode(os.path.join(fix_dir, "py_pcm.wav"), WAV_RATE,
               [(b - 128) * 256 for b in byte_stream(WAV_SEED, WAV_N)])
    print("python fixtures written")


# --------------------------------- main ----------------------------------

def main(sf_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    ids = [r[0] for r in con.execute(
        f"SELECT CAST(doc_id AS BIGINT) FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()]

    feats = [features_row(i) for i in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in feats], pa.int64()),
        "media_type": pa.array([r[1] for r in feats], pa.string()),
        "n_values": pa.array([r[2] for r in feats], pa.int64()),
        "brightness": pa.array([r[3] for r in feats], pa.float64()),
        "h0": pa.array([r[4] for r in feats], pa.float64()),
        "h5": pa.array([r[5] for r in feats], pa.float64()),
        "h15": pa.array([r[6] for r in feats], pa.float64()),
    }), os.path.join(out_dir, "mm_features.parquet"))

    frames = [r for i in ids for r in frame_rows(i)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in frames], pa.int64()),
        "frame_idx": pa.array([r[1] for r in frames], pa.int64()),
        "width": pa.array([r[2] for r in frames], pa.int64()),
        "height": pa.array([r[3] for r in frames], pa.int64()),
        "brightness": pa.array([r[4] for r in frames], pa.float64()),
    }), os.path.join(out_dir, "mm_frame_sample.parquet"))

    resz = [r for r in (resize_row(i) for i in ids) if r is not None]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in resz], pa.int64()),
        "width": pa.array([r[1] for r in resz], pa.int64()),
        "height": pa.array([r[2] for r in resz], pa.int64()),
        "out_width": pa.array([r[3] for r in resz], pa.int64()),
        "out_height": pa.array([r[4] for r in resz], pa.int64()),
        "out_brightness": pa.array([r[5] for r in resz], pa.float64()),
    }), os.path.join(out_dir, "mm_resize.parquet"))

    ph = phash_rows(ids)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in ph], pa.int64()),
        "ahash": pa.array([signed64(r[1]) for r in ph], pa.int64()),
    }), os.path.join(out_dir, "mm_phash.parquet"))

    pairs = phash_pairs(ph)
    pq.write_table(pa.table({
        "doc_a": pa.array([r[0] for r in pairs], pa.int64()),
        "doc_b": pa.array([r[1] for r in pairs], pa.int64()),
        "hamming": pa.array([r[2] for r in pairs], pa.int64()),
    }), os.path.join(out_dir, "mm_phash_pairs.parquet"))

    afp = afp_rows(ids)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in afp], pa.int64()),
        "afp": pa.array([signed64(r[1]) for r in afp], pa.int64()),
    }), os.path.join(out_dir, "mm_afp.parquet"))

    apairs = phash_pairs(afp)
    pq.write_table(pa.table({
        "doc_a": pa.array([r[0] for r in apairs], pa.int64()),
        "doc_b": pa.array([r[1] for r in apairs], pa.int64()),
        "hamming": pa.array([r[2] for r in apairs], pa.int64()),
    }), os.path.join(out_dir, "mm_afp_pairs.parquet"))

    vpairs = video_pair_rows(ids)
    pq.write_table(pa.table({
        "doc_a": pa.array([r[0] for r in vpairs], pa.int64()),
        "doc_b": pa.array([r[1] for r in vpairs], pa.int64()),
        "n_shared": pa.array([r[2] for r in vpairs], pa.int64()),
    }), os.path.join(out_dir, "mm_video_pairs.parquet"))

    print(f"wrote {len(feats)} features / {len(frames)} frames / "
          f"{len(resz)} resizes / {len(ph)} phashes / {len(pairs)} "
          f"phash pairs / {len(afp)} afps / {len(apairs)} afp pairs / "
          f"{len(vpairs)} video pairs to {out_dir}")

    fix_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mm_fixtures")
    write_py_fixtures(fix_dir)
    check_jvm_fixtures(fix_dir)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: mm_oracle.py <sfDir> <outDir>")
    main(sys.argv[1], sys.argv[2])
