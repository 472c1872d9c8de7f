"""Native C++ data-plane tests: build, CRC parity with the pure-Python
implementation, Example wire-format parsing parity, and speed sanity."""
import time

import numpy as np
import pytest

from audio_mps_tpu import native
from audio_mps_tpu.data.tfrecord import (_crc32c_py, encode_example,
                                         masked_crc, read_audio_tfrecords,
                                         write_audio_tfrecords)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.smoke
def test_crc32c_matches_python():
    assert native.crc32c(b"123456789") == 0xE3069283
    rng = np.random.RandomState(0)
    for n in [0, 1, 7, 8, 9, 1000, 65536]:
        data = rng.bytes(n)
        assert native.crc32c(data) == _crc32c_py(data), n


def test_masked_crc_matches():
    data = np.random.RandomState(1).bytes(4096)
    assert native.masked_crc(data) == masked_crc(data)


def test_parse_float_feature_matches_codec():
    audio = np.linspace(-1, 1, 64000).astype(np.float32)
    rec = encode_example({
        "pitch": np.array([50], np.int64),
        "audio": audio,
        "label": [b"guitar"],
    })
    out = native.parse_float_feature(rec, "audio")
    np.testing.assert_array_equal(out, audio)
    assert native.parse_float_feature(rec, "absent") is None


def test_parse_rejects_garbage():
    assert native.parse_float_feature(b"\xff\xff\xff\xff") is None
    assert native.parse_float_feature(b"") is None


def test_read_audio_uses_native(tmp_path):
    path = str(tmp_path / "w.tfrecords")
    waves = np.random.RandomState(0).randn(20, 16000).astype(np.float32)
    write_audio_tfrecords(path, waves)
    t0 = time.perf_counter()
    out = read_audio_tfrecords(path)
    dt = time.perf_counter() - t0
    np.testing.assert_array_equal(out, waves)
    # native parse of 20 x 16k floats should be well under a second
    assert dt < 2.0


def test_parse_split_and_unpacked_float_lists():
    """protobuf allows the float list as multiple packed runs and/or
    unpacked wire-5 scalars; the scanner must concatenate all of them
    (and the pure-Python decoder agrees)."""
    import struct
    vals = [1.5, -2.0, 3.25]
    # FloatList: packed run of 2 + one unpacked scalar
    fl = (b"\x0a\x08" + struct.pack("<2f", *vals[:2])      # field1 wire2 len8
          + b"\x0d" + struct.pack("<f", vals[2]))          # field1 wire5
    feat = b"\x12" + bytes([len(fl)]) + fl                 # Feature.float_list
    entry = b"\x0a\x05audio" + b"\x12" + bytes([len(feat)]) + feat
    feats = b"\x0a" + bytes([len(entry)]) + entry
    rec = b"\x0a" + bytes([len(feats)]) + feats
    out = native.parse_float_feature(rec, "audio")
    np.testing.assert_allclose(out, vals)
    from audio_mps_tpu.data.tfrecord import decode_example
    np.testing.assert_allclose(decode_example(rec)["audio"], vals)


def test_truncated_varint_lengths_rejected():
    """Oversized length varints must be rejected, not wrap the cursor."""
    # claims a 2^40-byte features field
    evil = b"\x0a" + b"\x80\x80\x80\x80\x80\x01"
    assert native.parse_float_feature(evil, "audio") is None
