"""Unit tests for the multimodal featurizers (SURVEY §2 I1-I4) —
deterministic stubs, real mapInPandas contracts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans import registry
from drive_bc_datapipeline_spark.plans.registry import QUERIES

registry.load_all_plans()

SF = "/root/testdata/sf0.001"


def test_bytes_meta_matches_python(spark):
    df = QUERIES["multimodal_bytes_meta"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows.keys() == src.keys()
    for doc_id, text in list(src.items())[:25]:
        b = text.encode("utf-8")
        r = rows[doc_id]
        assert r.n_bytes == len(b)
        assert r.first_byte == (b[0] if b else -1)
        assert r.payload_sig == hashlib.md5(b).hexdigest()[:8]


def test_resize_preserves_aspect_and_bounds(spark):
    df = QUERIES["multimodal_resize_stub"](spark, SF)
    for r in df.collect():
        assert 1 <= r.dst_w <= 224 and 1 <= r.dst_h <= 224
        # no upscaling
        assert r.dst_w <= r.src_w and r.dst_h <= r.src_h
        # aspect preserved within integer truncation (meaningless when a
        # side truncates to a handful of pixels)
        if (r.src_w > 224 or r.src_h > 224) and min(r.dst_w, r.dst_h) >= 10:
            assert abs(r.dst_w / r.src_w - r.dst_h / r.src_h) < 0.05


def test_frame_sample_fanout(spark):
    df = QUERIES["multimodal_frame_sample_stub"](spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # fan-out: ≥1 frame per doc, every sampled index divisible by K
    assert df.count() >= n_docs
    assert df.filter(F.col("frame_idx") % 4 != 0).count() == 0
    assert df.select("doc_id").distinct().count() == n_docs


def test_audio_windows_shape(spark):
    import json

    df = QUERIES["multimodal_audio_features_stub"](spark, SF)
    sample = df.limit(10).collect()
    for r in sample:
        energy = json.loads(r.window_energy)
        assert r.n_windows == len(energy)
        # each window sums ≤ 256 bytes of value ≤ 255
        assert all(0 <= e <= 255 * 256 for e in energy)


# ---------------------------------------------------------------------------
# r16 — REAL decode cores (operators/multimodal): pure-numpy BMP/WAV
# codecs + the featurizers the I1b/I4 driver keys compose.
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_pixel_exact():
    """decode(encode(px)) == px for dims that exercise every padding
    case (stride 4-aligned and not), 1x1, and tall/wide shapes —
    including the bottom-up row flip and the BGR swap."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (48, 16), (7, 3), (2, 2), (5, 4), (1, 9)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = mm.encode_bmp(px)
        assert buf[:2] == b"BM"
        # row stride padded to 4: total size is header + stride*h
        stride = (w * 3 + 3) // 4 * 4
        assert len(buf) == 54 + stride * h
        out = mm.decode_bmp(buf)
        assert out.shape == (h, w, 3) and (out == px).all()


def test_bmp_decode_honors_row_order_and_top_down():
    """A decoder that skips the bottom-up flip returns the mirror
    image; the negative-height (top-down) variant must NOT flip."""
    import struct

    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[0, 0] = (10, 20, 30)  # top-left RGB
    px[1, 3] = (40, 50, 60)  # bottom-right
    buf = mm.encode_bmp(px)
    out = mm.decode_bmp(buf)
    assert tuple(out[0, 0]) == (10, 20, 30)
    assert tuple(out[1, 3]) == (40, 50, 60)
    # file bytes: FIRST stored row is the BOTTOM row, in BGR
    assert buf[54:57] == bytes([0, 0, 0])  # bottom-left is zeros
    # rewrite height as negative (top-down): rows must come back in
    # stored order, i.e. vertically flipped vs the bottom-up read
    b = bytearray(buf)
    struct.pack_into("<i", b, 14 + 8, -2)
    flipped = mm.decode_bmp(bytes(b))
    assert (flipped == out[::-1]).all()


def test_bmp_decode_rejects_non_bi_rgb():
    import struct

    import numpy as np
    import pytest

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = mm.encode_bmp(px)
    with pytest.raises(ValueError, match="magic"):
        mm.decode_bmp(b"XX" + good[2:])
    b = bytearray(good)
    struct.pack_into("<H", b, 14 + 14, 8)  # bpp=8
    with pytest.raises(ValueError, match="24-bit"):
        mm.decode_bmp(bytes(b))
    b = bytearray(good)
    struct.pack_into("<I", b, 14 + 16, 1)  # compression=BI_RLE8
    with pytest.raises(ValueError, match="24-bit"):
        mm.decode_bmp(bytes(b))
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_bmp(good[:-1])


def test_wav_roundtrip_and_chunk_walk():
    """decode(encode(s)) == s for 8-bit mono, 16-bit mono, and 16-bit
    stereo; and the chunk walk survives a LIST chunk (with odd-size
    padding) inserted between fmt and data — a fixed-offset parse
    breaks there."""
    import struct

    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    s8 = rng.integers(0, 256, 300, dtype=np.uint8)
    out, rate = mm.decode_wav(mm.encode_wav(s8, 8000))
    assert rate == 8000 and out.shape == (300, 1) and (out[:, 0] == s8).all()

    s16 = rng.integers(-30000, 30000, 257).astype(np.int16)
    out, rate = mm.decode_wav(mm.encode_wav(s16, 44100))
    assert rate == 44100 and (out[:, 0] == s16).all()

    st = rng.integers(-100, 100, (10, 2)).astype(np.int16)
    out, rate = mm.decode_wav(mm.encode_wav(st, 16000))
    assert (out == st).all()

    # splice an odd-sized LIST chunk between fmt and data
    buf = mm.encode_wav(s8, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    spliced = buf[:fmt_end] + extra + buf[fmt_end:]
    # fix the RIFF size field
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    out, rate = mm.decode_wav(spliced)
    assert rate == 8000 and (out[:, 0] == s8).all()


def test_wav_decode_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    buf = mm.encode_wav(np.zeros(4, dtype=np.uint8), 8000)
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"JUNK" + buf[4:])
    b = bytearray(buf)
    struct.pack_into("<H", b, 12 + 8, 3)  # format tag 3 = IEEE float
    with pytest.raises(ValueError, match="format tag"):
        mm.decode_wav(bytes(b))
    b = bytearray(buf)
    struct.pack_into("<H", b, 12 + 8 + 14, 24)  # 24-bit
    with pytest.raises(ValueError, match="24-bit"):
        mm.decode_wav(bytes(b))


def test_decode_image_features_matches_decoded_pixels(spark):
    """The featurizer's columns come from the DECODED array: known
    pixel buffers in, exact dims/sum/top-left out."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, (2 + i, 3, 3), dtype=np.uint8)
            for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(mm.encode_bmp(px))) for i, px in imgs.items()],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in mm.decode_image_features(df).collect()}
    for i, px in imgs.items():
        r = rows[i]
        assert (r.height, r.width, r.n_channels) == px.shape
        assert r.px_sum == int(px.sum(dtype=np.int64))
        assert r.top_left_r == int(px[0, 0, 0])


def test_resize_image_bytes_real_pixels(spark):
    """The resize verb decodes, nearest-neighbor-downscales, and
    re-encodes REAL pixels: output payload round-trips to the exact
    numpy-downscaled array; in-box images pass through unchanged."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(5)
    big = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    small = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_bmp(big))),
         (2, bytearray(mm.encode_bmp(small)))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in mm.resize_image_bytes(df, max_w=30, max_h=30).collect()
    }
    r1 = rows[1]
    assert (r1.src_w, r1.src_h) == (60, 40)
    assert (r1.dst_w, r1.dst_h) == (30, 20)  # scale 1/2 exactly
    got = mm.decode_bmp(bytes(r1.payload))
    yi = (np.arange(20) * 40 // 20)
    xi = (np.arange(30) * 60 // 30)
    assert (got == big[yi][:, xi]).all()
    r2 = rows[2]
    assert (r2.dst_w, r2.dst_h) == (6, 4)  # clamped: no upscale
    assert (mm.decode_bmp(bytes(r2.payload)) == small).all()


def test_decode_audio_features_matches_decoded_samples(spark):
    import json

    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(9)
    s = rng.integers(0, 256, 600, dtype=np.uint8)
    st = rng.integers(-50, 50, (10, 2)).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_wav(s, 8000))),
         (2, bytearray(mm.encode_wav(st, 16000)))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in mm.decode_audio_features(df, window=256).collect()
    }
    r1 = rows[1]
    assert (r1.sample_rate, r1.n_samples, r1.n_windows) == (8000, 600, 3)
    a = np.pad(s.astype(np.int64), (0, 768 - 600)).reshape(3, 256)
    assert json.loads(r1.window_energy) == [int(x) for x in a.sum(axis=1)]
    r2 = rows[2]  # stereo mixes by summing channels
    assert (r2.sample_rate, r2.n_samples, r2.n_windows) == (16000, 10, 1)
    assert json.loads(r2.window_energy) == [int(st.sum())]


def test_binaryfile_ingest_to_decoders(spark, tmp_path):
    """The K14 → I composition a real corpus uses: write actual .bmp
    and .wav FILES, ingest through the binaryFile source, decode with
    the featurizers — no synthetic attach stage anywhere."""
    import numpy as np
    from pyspark.sql import functions as F

    from drive_bc_datapipeline_spark.operators import multimodal as mm
    from drive_bc_datapipeline_spark.sources.io import read_binary_dir

    rng = np.random.default_rng(13)
    imgs = {i: rng.integers(0, 256, (3 + i, 4, 3), dtype=np.uint8)
            for i in range(3)}
    for i, px in imgs.items():
        (tmp_path / f"img_{i}.bmp").write_bytes(mm.encode_bmp(px))
    wavs = {i: rng.integers(0, 256, 100 + i, dtype=np.uint8)
            for i in range(2)}
    for i, s in wavs.items():
        (tmp_path / f"clip_{i}.wav").write_bytes(mm.encode_wav(s, 8000))

    bmp_files = read_binary_dir(spark, str(tmp_path), glob="*.bmp").select(
        F.regexp_extract("path", r"img_(\d+)\.bmp", 1)
        .cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    rows = {r.doc_id: r for r in mm.decode_image_features(bmp_files).collect()}
    assert rows.keys() == imgs.keys()
    for i, px in imgs.items():
        assert rows[i].px_sum == int(px.sum(dtype=np.int64))
        assert (rows[i].height, rows[i].width) == px.shape[:2]

    wav_files = read_binary_dir(spark, str(tmp_path), glob="*.wav").select(
        F.regexp_extract("path", r"clip_(\d+)\.wav", 1)
        .cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    arows = {
        r.doc_id: r
        for r in mm.decode_audio_features(wav_files, window=64).collect()
    }
    for i, s in wavs.items():
        assert arows[i].n_samples == len(s)
        assert arows[i].sample_rate == 8000


def test_image_key_matches_text_bytes(spark):
    """The I1b driver key end-to-end at sf0.001: features equal the
    text-byte arithmetic the oracle states (pixels ARE the bytes)."""
    df = QUERIES["multimodal_image_stub"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows.keys() == src.keys()
    for doc_id, text in list(src.items())[:25]:
        b = text.encode("utf-8")
        r = rows[doc_id]
        assert r.width == 16 and r.n_channels == 3
        assert r.height == max(1, -(-len(b) // 48))
        assert r.px_sum == sum(b)
        assert r.top_left_r == (b[0] if b else 0)


def test_featurizers_honor_id_col(spark):
    """Review catch: the featurizers accepted id_col but hardcoded
    doc_id in their output schemas — the caller's id column name must
    survive the round trip."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    img = spark.createDataFrame(
        [(7, bytearray(mm.encode_bmp(px)))], "img_id long, payload binary"
    )
    out = mm.decode_image_features(img, id_col="img_id")
    assert out.columns[0] == "img_id"
    assert out.collect()[0]["img_id"] == 7
    rz = mm.resize_image_bytes(img, id_col="img_id")
    assert rz.columns[0] == "img_id"
    wav = spark.createDataFrame(
        [(9, bytearray(mm.encode_wav(np.zeros(4, dtype=np.uint8), 8000)))],
        "clip_id long, payload binary",
    )
    aout = mm.decode_audio_features(wav, id_col="clip_id")
    assert aout.columns[0] == "clip_id"
    assert aout.collect()[0]["clip_id"] == 9
    docs = spark.createDataFrame([(3, "ab")], "x long, text string")
    assert mm.attach_bmp_payload(docs, id_col="x").columns[0] == "x"
    assert mm.attach_wav_payload(docs, id_col="x").columns[0] == "x"


# ---------------------------------------------------------------------------
# r17 — the I2 key's REAL pixel path + the oracle ASCII precondition.
# ---------------------------------------------------------------------------


def test_resize_image_features_real_pixels(spark):
    """decode → NN grid → re-encode → RE-DECODE → feature in one
    stage: features equal the numpy-resized array's; in-box images
    keep their full pixel sum."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    small = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_bmp(big))),
         (2, bytearray(mm.encode_bmp(small)))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in mm.resize_image_features(
            df, max_w=30, max_h=30
        ).collect()
    }
    r1 = rows[1]
    assert (r1.src_w, r1.src_h, r1.dst_w, r1.dst_h) == (60, 40, 30, 20)
    yi = np.arange(20) * 40 // 20
    xi = np.arange(30) * 60 // 30
    want = big[yi][:, xi]
    assert r1.px_sum == int(want.sum(dtype=np.int64))
    assert r1.top_left_r == int(want[0, 0, 0])
    r2 = rows[2]
    assert (r2.dst_w, r2.dst_h) == (6, 4)
    assert r2.px_sum == int(small.sum(dtype=np.int64))
    # shared grid math: the byte-level sibling agrees bit-for-bit
    brows = {
        r.doc_id: r
        for r in mm.resize_image_bytes(df, max_w=30, max_h=30).collect()
    }
    decoded = mm.decode_bmp(bytes(brows[1].payload))
    assert int(decoded.sum(dtype=np.int64)) == r1.px_sum


def test_resize_key_matches_text_bytes(spark):
    """The I2 driver key end-to-end at sf0.001: dims + resized pixel
    sum equal the text-byte grid arithmetic the oracle states."""
    df = QUERIES["multimodal_resize_stub"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows.keys() == src.keys()
    for doc_id, text in list(src.items())[:25]:
        b = text.encode("utf-8")
        h = max(1, -(-len(b) // 48))
        scale = min(8 / 16, 8 / h, 1.0)
        w2 = max(1, int(16 * scale))
        h2 = max(1, int(h * scale))
        r = rows[doc_id]
        assert (r.src_w, r.src_h) == (16, h)
        assert (r.dst_w, r.dst_h) == (w2, h2)
        want = 0
        for j in range(h2):
            for i in range(w2):
                for c in range(3):
                    pos = (j * h // h2) * 48 + (i * 16 // w2) * 3 + c
                    want += b[pos] if pos < len(b) else 0
        assert r.px_sum == want, doc_id
        assert r.top_left_r == (b[0] if b else 0)


def test_documents_text_is_ascii():
    """The byte-reading DuckDB oracles index CHARACTERS
    (ord(substr(text, p, 1))) while the engine reads BYTES — equal
    only for ASCII text. The oracles NULL-poison on violation (loud
    mismatch); this pins the precondition on the testdata itself at
    both gate SFs (r16 ADVICE: checked, not just commented)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        n_bad = con.sql(
            "SELECT COUNT(*) FROM "
            f"'/root/testdata/{sf}/documents.parquet' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n_bad == 0, (sf, n_bad)


# ---------------------------------------------------------------------------
# r17 — REAL Y4M (YUV4MPEG2) video container for the I3 key.
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_and_rejects():
    """Byte-level codec contract: exact round-trip at C444, frame
    parameters tolerated, non-C444 / truncated / marker-less streams
    rejected by name."""
    import numpy as np
    import pytest

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, (5, 4, 6, 3), dtype=np.uint8)
    enc = mm.encode_y4m(fr, rate=(30, 1))
    assert enc.startswith(b"YUV4MPEG2 W6 H4 F30:1")
    dec, w, h, rate = mm.decode_y4m(enc)
    assert (dec == fr).all() and (w, h, rate) == (6, 4, (30, 1))
    # frame parameters after the marker are legal per spec
    dec2, *_ = mm.decode_y4m(enc.replace(b"FRAME\n", b"FRAME Xt\n", 1))
    assert (dec2 == fr).all()
    with pytest.raises(ValueError, match="signature"):
        mm.decode_y4m(b"JUNKSTREAM\n")
    with pytest.raises(ValueError, match="C420"):
        mm.decode_y4m(b"YUV4MPEG2 W4 H4 C420\nFRAME\n" + b"x" * 48)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_y4m(enc[:-5])
    with pytest.raises(ValueError, match="FRAME marker"):
        mm.decode_y4m(enc[: enc.index(b"FRAME")] + b"XXXXX\n")
    with pytest.raises(ValueError, match="need"):
        mm.encode_y4m(fr[0])


def test_text_y4m_convention_and_sampler(spark):
    """The text→Y4M convention byte map (frame f plane c pos (y,x) =
    byte f*192 + c*64 + y*16 + x) and the sampler's plane slicing vs
    a numpy reference."""
    import numpy as np

    from drive_bc_datapipeline_spark.operators import multimodal as mm

    raw = bytes(range(256)) * 4  # 1024 bytes → 6 frames
    y = mm.text_bytes_to_y4m(raw)
    frames, w, h, _ = mm.decode_y4m(y)
    assert (w, h) == (16, 4)
    n = max(1, -(-len(raw) // 192))
    assert frames.shape == (n, 4, 16, 3)
    flat = np.zeros(n * 192, dtype=np.uint8)
    flat[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    for f in range(n):
        for c in range(3):
            want = flat[f * 192 + c * 64 : f * 192 + (c + 1) * 64]
            assert (frames[f, :, :, c].ravel() == want).all(), (f, c)
    # empty text still encodes one all-zero frame
    f0, *_ = mm.decode_y4m(mm.text_bytes_to_y4m(b""))
    assert f0.shape == (1, 4, 16, 3) and f0.sum() == 0

    df = spark.createDataFrame(
        [(1, bytearray(y))], "doc_id long, payload binary"
    )
    rows = {
        r.frame_idx: r
        for r in mm.sample_video_frames(df, every_k=4).collect()
    }
    assert sorted(rows) == [0, 4]
    for i in (0, 4):
        seg = flat[i * 192 : (i + 1) * 192]
        assert rows[i].px_sum == int(seg.sum())
        assert rows[i].y_sum == int(seg[:64].sum())
    import pytest

    with pytest.raises(ValueError, match="every_k"):
        mm.sample_video_frames(df, every_k=0)


def test_frame_sample_key_matches_text_bytes(spark):
    """The I3 driver key end-to-end at sf0.001: sampled-frame sums
    equal the text-byte arithmetic the oracle states."""
    df = QUERIES["multimodal_frame_sample_stub"](spark, SF)
    rows = {(r.doc_id, r.frame_idx): r for r in df.collect()}
    src = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert {d for d, _i in rows} == set(src)
    for doc_id, text in list(src.items())[:15]:
        b = text.encode("utf-8")
        n_frames = max(1, -(-len(b) // 192))
        idxs = list(range(0, n_frames, 4))
        assert sorted(i for d, i in rows if d == doc_id) == idxs
        for i in idxs:
            seg = b[i * 192 : (i + 1) * 192]
            r = rows[(doc_id, i)]
            assert r.px_sum == sum(seg), (doc_id, i)
            assert r.y_sum == sum(seg[:64]), (doc_id, i)
