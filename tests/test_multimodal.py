"""Multimodal binary-column tests: plumbing AND codecs are real (P6/WAV)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_assets_deterministic(spark):
    from big_data_flight_spark.io import table
    from big_data_flight_spark.operators.multimodal import with_assets

    a = with_assets(table(spark, SF_SMOKE, "documents")).orderBy("doc_id").limit(3)
    one = [(r["doc_id"], bytes(r["image_bin"])) for r in a.collect()]
    two = [(r["doc_id"], bytes(r["image_bin"])) for r in a.collect()]
    assert one == two
    assert all(len(b) == 96 for _, b in one)  # 64-hex sha + 32-char prefix as utf8


def test_decode_kernel_closed_form():
    """The re-pointed decode kernel must reproduce the P6 pattern's
    closed form (mean over all channel bytes, full-raster contrast,
    container size including the ASCII header)."""
    import pandas as pd

    from big_data_flight_spark.operators.multimodal import (
        _synth_ppm,
        decode_images,
    )

    src = pd.DataFrame({"doc_id": [3, 10, 24]})
    out = next(decode_images(iter([_synth_ppm(iter([src])).__next__()])))
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        w, h, a = d % 7 + 4, d % 5 + 3, d % 13 + 1
        allb = (
            [(i * a) % 256 for i in range(w * h)]
            + [(i + d) % 256 for i in range(w * h)]
            + [(i * 3 + 7) % 256 for i in range(w * h)]
        )
        assert r["mean_byte"] == sum(allb) / (w * h * 3)
        assert r["contrast"] == float(max(allb) - min(allb))
        header = f"P6\n# synthetic asset {d}\n{w} {h}\n255\n"
        assert r["n_bytes"] == len(header) + w * h * 3
        assert r["decode_backend"] == "ppm"


def test_real_decoder_raises_without_codec(spark):
    from big_data_flight_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"bytes", {})


def test_decode_image_runs_distributed(spark):
    from big_data_flight_spark.operators.multimodal import mm_decode_image

    out = mm_decode_image(spark, SF_SMOKE).toPandas()
    assert len(out) == 500
    assert (out["decode_backend"] == "ppm").all()
    # container = header + w*h*3 raster; dims in [4,10]x[3,7]
    assert (out["n_bytes"] > 28).all()
    assert out["mean_byte"].between(0, 255).all()


def test_frame_sampling_counts(spark):
    from big_data_flight_spark.operators.multimodal import mm_frame_sample

    out = mm_frame_sample(spark, SF_SMOKE).toPandas()
    per_doc = out.groupby("doc_id").size()
    assert (per_doc == 4).all()  # 12 frames -> f = 0,3,6,9 kept
    assert sorted(out[out.doc_id == out.doc_id.iloc[0]]["frame_idx"]) == [0, 3, 6, 9]


def test_real_decoder_uses_codec_when_present(monkeypatch):
    """Future-proofs the env gaining codecs: when PIL is importable,
    _decode_image_real must decode through it (same output shape as
    the stub), not raise."""
    import sys
    import types

    import numpy as np

    fake_px = np.array([[0, 100], [50, 200]], dtype=np.uint8)

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return fake_px

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: _FakeImg()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    from big_data_flight_spark.operators.multimodal import _decode_image_real

    payload = b"\x89PNG-fake-bytes"
    mean, contrast, n = _decode_image_real(payload, {})
    assert mean == pytest.approx(87.5)  # mean of 0,100,50,200
    assert contrast == 200.0
    assert n == len(payload)


def _tiny_png_gray_2x2(pixels=(0, 100, 50, 200)) -> bytes:
    """Deterministic minimal 2x2 8-bit grayscale PNG, built from the
    public PNG spec (RFC 2083) with stdlib only — no codec library
    needed to GENERATE the bytes, so the real-decode branch gets a
    genuine PNG whenever a codec exists to READ it."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2, 8-bit, gray
    raw = b"\x00" + bytes(pixels[:2]) + b"\x00" + bytes(pixels[2:])  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_decoder_on_generated_png():
    """VERDICT r2 task 7: exercise the real PIL branch end-to-end on an
    actual PNG byte array whenever the env provides PIL; without PIL
    the same genuine payload must hit the NotImplementedError guard
    (never silently fall back to fake pixels). Green both ways."""
    from big_data_flight_spark.operators.multimodal import _decode_image_real

    payload = _tiny_png_gray_2x2()
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        with pytest.raises(NotImplementedError):
            _decode_image_real(payload, {})
        return

    mean, contrast, n = _decode_image_real(payload, {})
    assert mean == pytest.approx(87.5)  # mean of pixels 0,100,50,200
    assert contrast == 200.0
    assert n == len(payload)


def test_wav_roundtrip_kernels_and_corruption():
    """The WAV kernels must round-trip losslessly and FAIL LOUDLY on a
    corrupted container — silently decoding garbage into features is
    the failure mode a real multimodal pipeline can least afford."""
    import pandas as pd
    import pytest as _pytest

    from big_data_flight_spark.operators.multimodal import _decode_wav, _synth_wav

    src = pd.DataFrame({"doc_id": [0, 5, 12]})
    wav = next(_synth_wav(iter([src])))
    assert all(b[:4] == b"RIFF" and b[8:12] == b"WAVE" for b in wav["wav_bin"])

    out = next(_decode_wav(iter([wav])))
    # doc_id=0 -> step 1: sawtooth i%2048-1024 over 160 frames
    row = out[out.doc_id == 0].iloc[0]
    assert (row.n_frames, row.sample_rate) == (160, 16000)
    assert row.sum_abs == sum(abs((i % 2048) - 1024) for i in range(160))
    assert row.peak == max(((i % 2048) - 1024) for i in range(160))

    # corrupt the format chunk -> wave must refuse, not mis-decode
    bad = wav.copy()
    blob = bytearray(bad["wav_bin"].iloc[0])
    blob[20] = 0xFF  # wFormatTag -> unknown codec
    bad.loc[0, "wav_bin"] = bytes(blob)
    with _pytest.raises(Exception):
        next(_decode_wav(iter([bad])))


def test_ppm_roundtrip_kernels_and_corruption():
    """The P6 kernels must round-trip pixel-exactly through a genuine
    container (header with a comment line + raw raster) and fail
    LOUDLY on a corrupted header or truncated raster — never
    mis-decode silently."""
    import pandas as pd
    import pytest

    from big_data_flight_spark.operators.multimodal import (
        _decode_ppm,
        _parse_ppm,
        _synth_ppm,
    )

    src = pd.DataFrame({"doc_id": [3, 10, 24]})
    ppm = next(_synth_ppm(iter([src])))
    assert all(b.startswith(b"P6\n#") for b in ppm["ppm_bin"])
    out = next(_decode_ppm(iter([ppm])))
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        w, h, a = d % 7 + 4, d % 5 + 3, d % 13 + 1
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_r"] == sum((i * a) % 256 for i in range(w * h))
        assert r["sum_g"] == sum((i + d) % 256 for i in range(w * h))
        assert r["sum_b"] == sum((i * 3 + 7) % 256 for i in range(w * h))
    # corrupted magic -> loud refusal
    blob = bytearray(ppm["ppm_bin"].iloc[0])
    blob[1:2] = b"5"  # P6 -> P5
    with pytest.raises(ValueError, match="not a P6"):
        _parse_ppm(bytes(blob))
    # truncated raster -> loud refusal
    good = bytes(ppm["ppm_bin"].iloc[0])
    with pytest.raises(ValueError, match="truncated"):
        _parse_ppm(good[:-1])


def test_wav_window_features_match_closed_form():
    """The windowed audio features must reproduce the sawtooth's
    closed form per 40-sample window — proving the decode + windowing
    stride arithmetic, not just the whole-signal sums."""
    import pandas as pd

    from big_data_flight_spark.operators.multimodal import (
        _synth_wav,
        _wav_window_features,
    )

    src = pd.DataFrame({"doc_id": [7]})
    out = next(_wav_window_features(iter([_synth_wav(iter([src])).__next__()])))
    step = 7 % 13 + 1
    xs = [((i * step) % 2048) - 1024 for i in range(160)]
    assert len(out) == 4
    for _, r in out.iterrows():
        w = int(r["window_idx"])
        seg = xs[w * 40 : w * 40 + 40]
        assert r["energy"] == sum(v * v for v in seg)
        assert r["n_zero_cross"] == sum(
            (seg[i - 1] < 0) != (seg[i] < 0) for i in range(1, 40)
        )
        assert r["peak_abs"] == max(abs(v) for v in seg)


def test_dedup_assets_duplicate_path_is_exercised(spark):
    """The HAVING > 1 path must be non-vacuous on the current fixture
    (the r7 re-key onto template-prefix payloads): duplicate groups
    exist and every group counts at least two copies."""
    from big_data_flight_spark.operators.multimodal import mm_dedup_assets

    rows = mm_dedup_assets(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r["n_copies"] >= 2 for r in rows)
