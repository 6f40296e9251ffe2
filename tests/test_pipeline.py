"""Pipeline operator semantics: dedup recall, simhash self-similarity,
ANN sanity vs brute force, text metrics, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from tdengine_spark.pipeline import dedup as dd
from tdengine_spark.pipeline import similarity as sim
from tdengine_spark.pipeline import text as tx
from tdengine_spark.pipeline.multimodal import (
    decode_images,
    sample_frames,
    synthetic_assets,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark query engines and scale"),
        (4, "  The   QUICK brown fox jumps over the lazy dog again and again today "),
    ]  # 4 = exact dup of 0 after normalization
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = dd.exact_dedup(_docs(spark)).collect()
    got = {r.doc_id: r.dup_count for r in out}
    assert got == {0: 3, 2: 1, 3: 1}  # 0,1,4 collapse; keeps min id


def test_minhash_finds_near_dups(spark):
    # 128 hashes / 32 bands: banding recall at jaccard≈0.57 is ~97%
    # (vs ~83% for the 64/16 default) — the pair below is a must-find
    pairs = dd.minhash_dedup(
        _docs(spark), num_hashes=128, bands=32, threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found and (0, 4) in found  # exact dups always survive
    assert (0, 2) in found or (1, 2) in found  # near dup should bucket together
    assert all(3 not in p for p in found)  # unrelated doc never pairs


def test_simhash_hamming(spark):
    sims = dd.simhash(_docs(spark))
    pairs = dd.simhash_near_pairs(sims, max_hamming=10).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 4) in found  # normalization-equal
    assert all(3 not in k for k in found)


def test_minhash_arrow_equals_expr(spark):
    """One hash family: arrow and expr signatures are pair-for-pair
    identical, so persisted signatures survive a method switch."""
    docs = _docs(spark)
    arrow = {r.doc_id: list(r.signature)
             for r in dd.minhash_signatures(docs, method="arrow").collect()}
    expr = {r.doc_id: list(r.signature)
            for r in dd.minhash_signatures(docs, method="expr").collect()}
    assert arrow == expr
    assert len(arrow) == 5 and all(len(s) == 64 for s in arrow.values())


def test_simhash_arrow_equals_expr(spark):
    docs = _docs(spark)
    arrow = {r.doc_id: r.simhash
             for r in dd.simhash(docs, method="arrow").collect()}
    expr = {r.doc_id: r.simhash
            for r in dd.simhash(docs, method="expr").collect()}
    assert arrow == expr
    # empty/whitespace-only text goes through the same [""] token path
    edge = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    a = {r.doc_id: r.simhash for r in dd.simhash(edge, method="arrow").collect()}
    e = {r.doc_id: r.simhash for r in dd.simhash(edge, method="expr").collect()}
    assert a == e


def test_single_pass_tokenizer_matches_collapse_form(spark):
    """r14 tokenizer: split directly on \\s+ must yield the exact token
    arrays of the old regexp_replace-collapse-then-split form on every
    whitespace shape, so shingle and simhash outputs are bit-stable
    across the optimization."""
    rows = [
        (0, "plain words here"),
        (1, "multi   spaces\tand\ttabs"),
        (2, "  leading and trailing   "),
        (3, "line\nbreaks\r\nand more"),  #   is NOT \s in Java
        (4, ""),
        (5, "   "),
        (6, None),
        (7, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    txt = F.coalesce(F.col("text"), F.lit(""))
    old = F.split(F.regexp_replace(F.lower(F.trim(txt)), r"\s+", " "), " ")
    mismatch = (
        df.select(old.alias("o"), F.split(F.lower(F.trim(txt)), r"\s+").alias("n"))
        .where(F.col("o") != F.col("n"))
        .count()
    )
    assert mismatch == 0
    # and the derived surfaces agree end-to-end on the same edge rows
    sh = {r.doc_id: list(r.s) for r in df.select(
        "doc_id", tx.shingles("text").alias("s")).collect()}
    assert sh[0] == ["plain words here"]
    assert sh[1] == ["multi spaces and", "spaces and tabs"]
    assert sh[4] == [""] and sh[5] == [""]


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 2, 3]


def test_lsh_ann_recall_on_clear_structure(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [(0, (base / np.linalg.norm(base)).tolist())]
    # scaled copy: identical direction → identical hyperplane signs →
    # guaranteed same bucket, cosine exactly 1
    rows.append((1, (2.0 * base).tolist()))
    for i in range(2, 40):
        v = rng.standard_normal(16)
        rows.append((i, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.lsh_ann_topk(
        emb, emb.where(F.col("vec_id") == 0), dim=16, k=3, nbits=4
    ).collect()
    # the near-identical vector must land in the same bucket and rank #1
    top = min(out, key=lambda r: r.rank)
    assert top.neighbor_id == 1


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "Hello, world! 123 foo_bar"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.nt, r.nw)
        for r in df.select(
            "doc_id",
            tx.token_count("text").alias("nt"),
            tx.whitespace_token_count("text").alias("nw"),
        ).collect()
    }
    # Hello , world ! 123 foo _ bar → 8 regex tokens; 4 ws tokens
    assert out[0] == (8, 4)
    assert out[1] == (0, 0)
    assert out[2] == (0, 0)


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is nice that it is"),
            (1, "der hund ist nicht zu haus und das ist gut"),
            (2, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    scored = tx.quality_score(df)
    assert "quality_score" in scored.columns
    langs = {r.doc_id: r.lang_pred for r in tx.language_id(df).collect()}
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "A  b\tC"), (1, "a b c"), (2, "abc")], "doc_id long, text string"
    )
    out = {r.doc_id: r.fp for r in df.select(
        "doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, 30)
    dec = decode_images(assets).collect()
    assert len(dec) == len([1 for i in range(30) if i % 3 == 0])
    assert all(r.width >= 1 and r.height >= 1 for r in dec)
    assert all(len(r.feature) == 8 for r in dec)
    assert all(abs(sum(r.feature) - 1.0) < 1e-6 for r in dec)
    frames = sample_frames(assets)
    assert frames.count() > 0
    assert frames.schema.simpleString() == (
        "struct<asset_id:bigint,frame_idx:int,frame:binary>"
    )


def test_multiprobe_recall_vs_bruteforce(spark):
    """probe_radius=1 at nbits=8 recovers ≥0.9 recall@5 vs exact top-k.

    Data has real cluster structure (near-duplicate groups) — the case
    ANN is for; on isotropic random data there are no near neighbors and
    any LSH family degenerates by design."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 20, 20
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    for j in range(n_clusters):
        pts = centers[j] + 0.05 * rng.standard_normal((per, dim))
        for i, v in enumerate(pts):
            rows.append((j * per + i, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id") % per == 0)  # one per cluster
    exact = sim.cosine_topk(emb, queries, k=5)
    approx = sim.lsh_ann_topk(
        emb, queries, dim=dim, k=5, nbits=8, probe_radius=1
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"recall@5 = {recall:.3f}"
    # multi-probe must strictly beat single-bucket recall at this width
    single = {
        (r.query_id, r.neighbor_id)
        for r in sim.lsh_ann_topk(
            emb, queries, dim=dim, k=5, nbits=8, probe_radius=0
        ).collect()
    }
    assert len(e & a) >= len(e & single)


def test_cosine_near_dup_exact_vs_lsh(spark):
    """LSH candidates are a subset of exact pairs; on clustered data the
    near-dup recall is high."""
    import numpy as np

    rng = np.random.default_rng(5)
    dim = 16
    rows = []
    # 10 clusters of 4 near-identical vectors + 60 random singletons
    for j in range(10):
        c = rng.standard_normal(dim)
        for i in range(4):
            rows.append((j * 4 + i, (c + 0.01 * rng.standard_normal(dim)).tolist()))
    for i in range(60):
        rows.append((100 + i, rng.standard_normal(dim).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs(emb, 0.95, method="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs(
            emb, 0.95, method="lsh", dim=dim, nbits=8, probe_radius=1
        ).collect()
    }
    # every cluster contributes its C(4,2)=6 pairs to exact
    assert len(exact) == 60
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9  # near-identical vectors co-bucket


def test_cosine_topk_oversized_query_side_raises(spark, monkeypatch):
    import tdengine_spark.pipeline.similarity as simmod
    import pytest as _pytest

    emb = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    # shrink the guard so the test stays cheap; the production default
    # only changes the constant, not the failure mode
    monkeypatch.setattr(simmod, "QUERY_SIDE_MAX_ROWS", 10, raising=True)
    with _pytest.raises(ValueError, match="query side exceeds"):
        simmod.cosine_topk(emb, emb)


def _encode_png(width, height, rows, color_type=2):
    """Minimal PNG writer (filter 0, one IDAT) for known-pixel tests."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_known_pixels(spark):
    """The PNG kernel decodes REAL pixel values: a 4x2 RGB image with
    known bytes yields exact width/height and channel means."""
    from tdengine_spark.pipeline.multimodal import (
        _decode_image_bytes,
        _decode_png,
        decode_images,
    )

    # 4x2 RGB: red row then blue row
    red = [255, 0, 0] * 4
    blue = [0, 0, 255] * 4
    png = _encode_png(4, 2, [red, blue])
    w, h, nch, px = _decode_png(png)
    assert (w, h, nch) == (4, 2, 3)
    assert px == bytes(red) + bytes(blue)

    w2, h2, feat = _decode_image_bytes(png)
    assert (w2, h2) == (4, 2)
    # channel means: R = 255/2, G = 0, B = 255/2 (normalized)
    assert feat[0] == pytest.approx(0.5, abs=1e-3)
    assert feat[1] == pytest.approx(0.0, abs=1e-9)
    assert feat[2] == pytest.approx(0.5, abs=1e-3)

    # filters round-trip: encode with Sub/Up filters via a gradient
    grad_rows = [
        [(x * 7 + y * 13) % 256 for x in range(6 * 3)] for y in range(5)
    ]
    png2 = _encode_png(6, 5, grad_rows)
    w3, h3, nch3, px3 = _decode_png(png2)
    assert (w3, h3, nch3) == (6, 5, 3)
    assert list(px3) == [v for r in grad_rows for v in r]

    # end-to-end through the Spark mapInPandas plumbing
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(png), None)],
        "asset_id long, modality string, mime string, payload binary, "
        "meta map<string,string>",
    )
    out = decode_images(df).collect()
    assert len(out) == 1
    assert (out[0].width, out[0].height) == (4, 2)
    assert out[0].feature[1] == pytest.approx(0.0, abs=1e-9)


def _mk_jpeg_gray(block_vals, q=16):
    """Minimal baseline JPEG encoder (test-side): grayscale image of
    8×8 blocks laid out in a row (width = 8·len, height = 8), each a
    solid value. Flat quant table q; tiny custom huffman tables (all
    4-bit codes). Exercises DC prediction across MCUs and EXTEND."""
    import struct

    out = bytearray(b"\xff\xd8")
    # DQT id 0, flat
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    w = 8 * len(block_vals)
    # SOF0: 8-bit, h=8, w, 1 component (id 1, 1x1, q0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, w, 1)
    out += bytes([1, 0x11, 0])
    # DHT: DC class0 id0 — symbols 0..11, all length 4 (12 codes)
    bits = [0, 0, 0, 12] + [0] * 12
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 12)
    out += b"\x00" + bytes(bits) + bytes(range(12))
    # DHT: AC class1 id0 — symbols EOB(0x00) + a few, length 4
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 4)
    out += b"\x10" + bytes([0, 0, 0, 4] + [0] * 12)
    out += bytes([0x00, 0x01, 0x11, 0xF0])
    # SOS: 1 component, tables 0/0
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy-coded data: per block, DC diff huffman(cat)+bits, then EOB
    bitbuf = []

    def put(code, n):
        for i in range(n - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    pred = 0
    for v in block_vals:
        dc = round(8 * (v - 128) / q)
        diff = dc - pred
        pred = dc
        mag = abs(diff)
        cat = mag.bit_length()
        put(0b0000 + cat, 4)  # huffman code for category = canonical
        if cat:
            put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        put(0b0000, 4)  # EOB (symbol 0x00 is the first AC code)
    while len(bitbuf) % 8:
        bitbuf.append(1)
    data = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i:i + 8]:
            byte = (byte << 1) | b
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    out += data + b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_known_pixels():
    """Round-trip a hand-encoded baseline JPEG through _decode_jpeg:
    solid blocks reconstruct exactly (flat quant, DC-only blocks), DC
    prediction chains across MCUs."""
    from tdengine_spark.pipeline.multimodal import _decode_jpeg

    vals = [200, 72, 128, 16]
    payload = _mk_jpeg_gray(vals, q=16)
    w, h, nch, px = _decode_jpeg(payload)
    assert (w, h, nch) == (32, 8, 1)
    import numpy as np

    img = np.frombuffer(px, dtype=np.uint8).reshape(8, 32)
    for i, v in enumerate(vals):
        block = img[:, 8 * i:8 * i + 8]
        # flat-quant DC-only reconstruction: round(8(v-128)/16)·16/8+128
        expect = round(8 * (v - 128) / 16) * 16 / 8 + 128
        assert np.all(block == int(expect)), (i, v, block[0, :3])


def test_jpeg_decode_feature_dispatch():
    """_decode_image_bytes routes JPEG payloads through the real decoder:
    the feature means equal the solid value / 255."""
    from tdengine_spark.pipeline.multimodal import _decode_image_bytes

    payload = _mk_jpeg_gray([200], q=16)
    w, h, feat = _decode_image_bytes(payload)
    assert (w, h) == (8, 8)
    assert abs(feat[0] - 200 / 255) < 1e-6
    assert feat[4] == 0.0  # solid block → zero std


def test_jpeg_decode_color_420():
    """Constant-color 16×16 4:2:0 JPEG: 4 interleaved Y blocks + Cb +
    Cr per MCU, chroma upsampled 2×2, BT.601 conversion."""
    import struct

    import numpy as np

    from tdengine_spark.pipeline.multimodal import _decode_jpeg

    q = 16
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    bits = [0, 0, 0, 12] + [0] * 12
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 12)
    out += b"\x00" + bytes(bits) + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 4)
    out += b"\x10" + bytes([0, 0, 0, 4] + [0] * 12)
    out += bytes([0x00, 0x01, 0x11, 0xF0])
    out += b"\xff\xda" + struct.pack(">H", 12)
    out += bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])

    bitbuf = []

    def put(code, n):
        for i in range(n - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def put_dc(diff):
        mag = abs(diff)
        cat = mag.bit_length()
        put(cat, 4)
        if cat:
            put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        put(0, 4)  # EOB

    yv, cbv, crv = 90, 140, 160
    dcs = {k: round(8 * (v - 128) / q) for k, v in
           [("y", yv), ("cb", cbv), ("cr", crv)]}
    # one MCU: 4 Y blocks (first carries the diff, rest diff 0), Cb, Cr
    put_dc(dcs["y"])
    for _ in range(3):
        put_dc(0)
    put_dc(dcs["cb"])
    put_dc(dcs["cr"])
    while len(bitbuf) % 8:
        bitbuf.append(1)
    data = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i:i + 8]:
            byte = (byte << 1) | b
        data.append(byte)
        if byte == 0xFF:
            data.append(0x00)
    out += data + b"\xff\xd9"

    w, h, nch, px = _decode_jpeg(bytes(out))
    assert (w, h, nch) == (16, 16, 3)
    img = np.frombuffer(px, dtype=np.uint8).reshape(16, 16, 3)
    y, cb, cr = 90.0, 140.0 - 128, 160.0 - 128
    expect = (
        int(y + 1.402 * cr),
        int(y - 0.344136 * cb - 0.714136 * cr),
        int(y + 1.772 * cb),
    )
    assert np.all(img.reshape(-1, 3) == np.array(expect)), (
        img[0, 0], expect
    )


def test_wav_decode_known_sine(spark):
    """RIFF/WAV kernel on a generated 440 Hz 16-bit sine: header fields,
    duration, and RMS ≈ amp/√2 must come back exactly; the Spark-side
    decode_audio plumbing carries the same values per asset row."""
    import math
    import struct

    from tdengine_spark.pipeline.multimodal import (
        ASSET_SCHEMA,
        _decode_wav_bytes,
        decode_audio,
    )

    sr, secs, amp = 8000, 0.5, 0.25
    n = int(sr * secs)
    samples = [
        int(amp * 32767 * math.sin(2 * math.pi * 440 * i / sr))
        for i in range(n)
    ]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )

    srate, ch, ns, dur, feat = _decode_wav_bytes(wav)
    assert (srate, ch, ns) == (sr, 1, n)
    assert abs(dur - secs) < 1e-9
    assert abs(feat[0] - amp / math.sqrt(2)) < 0.01  # rms
    assert abs(feat[1] - amp) < 0.01                 # peak

    # stereo mixdown: L = sine, R = -sine → mono mixdown is silence
    stereo = b"".join(
        struct.pack("<hh", s, -s) for s in samples
    )
    fmt2 = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    wav2 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt2) + 8 + len(stereo))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
        + b"data" + struct.pack("<I", len(stereo)) + stereo
    )
    srate2, ch2, ns2, _, feat2 = _decode_wav_bytes(wav2)
    assert (srate2, ch2, ns2) == (sr, 2, n)
    assert feat2[0] < 1e-4  # L + R cancel

    df = spark.createDataFrame(
        [(1, "audio", "audio/wav", wav, None),
         (2, "audio", "audio/wav", b"not a wav", None)],
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in decode_audio(df).collect()}
    assert rows[1].sample_rate == sr and rows[1].n_samples == n
    assert abs(rows[1].feature[0] - amp / math.sqrt(2)) < 0.01
    assert rows[2].sample_rate is None and rows[2].feature is None
