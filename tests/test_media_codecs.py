"""Real media codecs (BMP / WAV / Y4M): exact roundtrips, header-quirk
handling, and the decode pipelines vs a brute-force recompute."""

import numpy as np
import pytest

from rayindex import media_codecs as mc


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 5), (4, 4), (17, 3), (33, 9)])
def test_bmp_roundtrip_exact(w, h):
    # widths chosen so row padding covers all (w*3) % 4 residues
    arr = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(arr)), arr)


def test_bmp_header_fields():
    arr = mc.gen_image(5)
    payload = mc.encode_bmp(arr)
    import struct

    assert payload[:2] == b"BM"
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)  # file size
    w, h = struct.unpack_from("<ii", payload, 18)
    assert (w, h) == (arr.shape[1], arr.shape[0])
    assert struct.unpack_from("<H", payload, 28)[0] == 24  # bpp


def test_bmp_top_down_variant():
    # decoder must honor negative height = top-down row order
    arr = RNG.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    payload = bytearray(mc.encode_bmp(arr[::-1]))  # encode flipped, then mark top-down
    import struct

    struct.pack_into("<i", payload, 22, -4)
    assert np.array_equal(mc.decode_bmp(bytes(payload)), arr[::-1][::-1])


def test_bmp_rejects_other_formats():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"PNG rubbish")


@pytest.mark.parametrize("n,rate", [(1, 8000), (255, 16000), (1024, 44100)])
def test_wav_roundtrip_exact(n, rate):
    s = RNG.integers(-32768, 32768, size=n, dtype=np.int16)
    got_rate, got = mc.decode_wav(mc.encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(got, s)


def test_wav_skips_extra_chunks_and_pad_byte():
    # a LIST chunk with ODD size before data: the walker must skip size+pad
    import struct

    s = np.arange(-3, 4, dtype=np.int16)
    base = mc.encode_wav(s, 8000)
    fmt_chunk = base[12:36]  # 'fmt ' + size(16) + body
    data_chunk = base[36:]
    info = b"xyz"  # odd length 3 → 1 pad byte
    extra = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got = mc.decode_wav(payload)
    assert rate == 8000 and np.array_equal(got, s)


@pytest.mark.parametrize("n,w,h", [(1, 2, 2), (3, 5, 4), (7, 8, 3)])
def test_y4m_roundtrip_exact(n, w, h):
    frames = RNG.integers(0, 256, size=(n, 3, h, w), dtype=np.uint8)
    gw, gh, got = mc.decode_y4m(mc.encode_y4m(frames))
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, frames)


def test_y4m_header_param_order_insensitive():
    frames = RNG.integers(0, 256, size=(2, 3, 2, 3), dtype=np.uint8)
    payload = mc.encode_y4m(frames)
    head, rest = payload.split(b"\n", 1)
    # reorder tags; add an unknown X tag the decoder must ignore
    reordered = b"YUV4MPEG2 C444 Xextra H2 W3 F25:1\n" + rest
    gw, gh, got = mc.decode_y4m(reordered)
    assert (gw, gh) == (3, 2) and np.array_equal(got, frames)


def test_y4m_rejects_c420():
    with pytest.raises(ValueError):
        mc.decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + b"\0" * 6)


def test_generators_match_closed_forms():
    # spot-check the oracle closed forms against the generated arrays
    for d in (0, 3, 44, 301):
        img = mc.gen_image(d)
        w, h = mc.image_params(d)
        assert img.shape == (h, w, 3)
        assert img[2, 5, 1] == (5 + 2 + 1 + d) % 256
        aud = mc.gen_audio(d)
        assert aud[11] == ((7 * 11 + d) % 65536) - 32768
        vid = mc.gen_video(d)
        assert int(vid[2, 1, 0, 0]) == (31 * 2 + d) % 256
        assert (vid[2] == vid[2, 0, 0, 0]).all()


def test_media_stats_pipelines_vs_bruteforce(ray_session):
    sf = "/root/testdata/sf0.001"
    from rayindex.multimodal import (
        media_audio_stats,
        media_image_stats,
        media_video_frames,
    )

    img = media_image_stats(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert (img["media_id"] % 3 == 0).all() and len(img) > 0
    for _, r in img.head(5).iterrows():
        arr = mc.gen_image(int(r["media_id"]))
        assert (r["height"], r["width"]) == arr.shape[:2]
        assert r["pixel_sum"] == int(arr.sum(dtype=np.int64))

    aud = media_audio_stats(sf).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert (aud["media_id"] % 3 == 1).all() and len(aud) > 0
    for _, r in aud.head(5).iterrows():
        d = int(r["media_id"])
        rate, n = mc.audio_params(d)
        assert (r["sample_rate"], r["n_samples"]) == (rate, n)
        assert r["sample_sum"] == int(mc.gen_audio(d).sum(dtype=np.int64))

    vid = media_video_frames(sf).to_pandas()
    assert (vid["media_id"] % 3 == 2).all() and len(vid) > 0
    one = int(vid["media_id"].iloc[0])
    frames = mc.gen_video(one)
    sub = vid[vid["media_id"] == one].sort_values("frame_id")
    assert list(sub["frame_id"]) == list(range(0, frames.shape[0], 4))
    for _, r in sub.iterrows():
        assert r["frame_sum"] == int(frames[int(r["frame_id"])].sum(dtype=np.int64))
