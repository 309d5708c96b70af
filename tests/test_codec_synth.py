"""Block codec round-trips, PSNR/caption per-row invariants, synthesizer
determinism and skew (the north rule's per-row invariant gate)."""

import numpy as np
import pytest

from data_cube_utilities_spark import cells, codec, synth


def _rand_block(seed=0, h=16, w=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 65536, size=(h, w, codec.N_BANDS)).astype(np.uint16)


def test_raw16_roundtrip():
    blk = _rand_block(1)
    data = codec.encode_block(blk, "raw16")
    assert len(data) == 16 * 16 * codec.N_BANDS * 2
    out = codec.decode_block(data, 16, 16, "raw16")
    assert (out == blk).all()
    assert codec.psnr(out, blk) == float("inf")


def test_pngz_roundtrip_is_real_png():
    blk = _rand_block(2, h=9, w=13)  # non-square, odd dims
    data = codec.encode_block(blk, "pngz")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codec.decode_block(data, 13, 9, "pngz")
    assert (out == blk).all()
    assert codec.psnr(out, blk) >= 40.0  # lossless => inf >= 40dB gate


def test_psnr_lossy_gate():
    blk = _rand_block(3).astype(np.float64)
    noisy = blk + np.random.RandomState(4).normal(0, 100, blk.shape)
    assert 40.0 < codec.psnr(noisy, blk) < 80.0


def test_phash_deterministic_and_local():
    blk = _rand_block(5, h=32, w=32)
    h1 = codec.phash64(blk)
    h2 = codec.phash64(blk.copy())
    assert h1 == h2
    # small perturbation -> small hamming distance
    pert = blk.copy()
    pert[0, 0, 0] += 5
    assert codec.hamming64(h1, codec.phash64(pert)) <= 4


def test_synth_batch_deterministic():
    ids = np.arange(20, dtype=np.int64)
    a = synth.synth_batch(ids, seed=42, tile_px=16)
    b = synth.synth_batch(ids, seed=42, tile_px=16)
    assert a["caption"].tolist() == b["caption"].tolist()
    assert a["phash"].tolist() == b["phash"].tolist()
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    # different seed -> different placement
    c = synth.synth_batch(ids, seed=7, tile_px=16)
    assert a["lat0"].tolist() != c["lat0"].tolist()


def test_synth_per_row_invariants():
    ids = np.arange(30, dtype=np.int64)
    df = synth.synth_batch(ids, seed=42, tile_px=16)
    for _, r in df.iterrows():
        blk = codec.decode_block(r["bytes"], r["w"], r["h"], r["fmt"])
        assert blk.shape == (16, 16, codec.N_BANDS)
        assert codec.phash64(blk) == r["phash"]  # decode -> rehash matches
        assert r["caption"].startswith(f"tile {r['image_id']} over")
        assert int(cells.cell_res(r["cell_id"])) == synth.DEFAULT_RES
        got = cells.encode(r["lat0"], r["lon0"], synth.DEFAULT_RES)
        assert int(got) == r["cell_id"]
    assert set(df["fmt"]) <= {"raw16", "pngz"}


def test_synth_skew():
    ids = np.arange(4000, dtype=np.int64)
    lat, lon = synth.footprints(ids, seed=42)
    cell = cells.encode(lat, lon, 5)
    _, counts = np.unique(cell, return_counts=True)
    # skewed: the hottest cell should hold far more than the mean
    assert counts.max() > 8 * counts.mean()


@pytest.mark.usefixtures("spark")
def test_synthesize_images_distributed(spark):
    df = synth.synthesize_images(spark, 64, seed=42, tile_px=8, partitions=4)
    pdf = df.toPandas()
    assert len(pdf) == 64
    assert pdf["image_id"].is_unique
    # distributed output == local batch output, row for row
    local = synth.synth_batch(np.arange(64, dtype=np.int64), seed=42, tile_px=8)
    merged = pdf.sort_values("image_id").reset_index(drop=True)
    locals = local.sort_values("image_id").reset_index(drop=True)
    assert (merged["phash"] == locals["phash"]).all()
    assert (merged["caption"] == locals["caption"]).all()
    assert (merged["cell_id"] == locals["cell_id"]).all()
