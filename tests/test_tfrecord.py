"""TFRecord codec tests: CRC vectors, roundtrips, NSynth filtering, and the
get_audio TFRecord branch the reference never tested (SURVEY.md §4 gaps)."""
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import (NSynthDataset, decode_example, encode_example,
                                get_audio, read_audio_tfrecords, read_records,
                                write_audio_tfrecords, write_records)
from audio_mps_tpu.data.tfrecord import _crc32c_py, crc32c, masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 / standard CRC32C check value
    assert crc32c(b"123456789") == 0xE3069283
    assert _crc32c_py(b"123456789") == 0xE3069283
    assert _crc32c_py(b"") == 0
    # accelerated and pure implementations agree on random data
    data = np.random.RandomState(0).bytes(1024)
    assert crc32c(data) == _crc32c_py(data)


@pytest.mark.smoke
def test_record_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    payloads = [b"hello", b"", b"x" * 1000]
    write_records(path, payloads)
    assert list(read_records(path)) == payloads


def test_corrupt_record_detected(tmp_path):
    path = str(tmp_path / "x.tfrecords")
    write_records(path, [b"hello world"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(read_records(path))


def test_truncated_between_payload_and_crc(tmp_path):
    """A file cut between payload and its CRC must raise the module's
    IOError('truncated record CRC') contract, not struct.error."""
    path = str(tmp_path / "x.tfrecords")
    write_records(path, [b"hello world"])
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-2])  # drop half the payload CRC
    with pytest.raises(IOError, match="truncated record CRC"):
        list(read_records(path))


def test_example_roundtrip():
    ex = {
        "audio": np.linspace(-1, 1, 640).astype(np.float32),
        "pitch": np.array([50], dtype=np.int64),
        "note": np.array([7, -3], dtype=np.int64),
        "instrument_family_str": [b"guitar"],
    }
    dec = decode_example(encode_example(ex))
    np.testing.assert_array_equal(dec["audio"], ex["audio"])
    np.testing.assert_array_equal(dec["pitch"], ex["pitch"])
    np.testing.assert_array_equal(dec["note"], ex["note"])
    assert dec["instrument_family_str"] == [b"guitar"]


def test_handcrafted_wire_bytes():
    """Decode against hand-assembled wire bytes (no self-referential
    encoder): Example{features{feature{key:"audio" value{float_list{1.5}}}}}"""
    float_list = b"\x0a\x04" + np.float32(1.5).tobytes()    # field1 len4 packed
    feature = b"\x12" + bytes([len(float_list)]) + float_list  # Feature.float_list
    entry = b"\x0a\x05audio" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    dec = decode_example(example)
    np.testing.assert_allclose(dec["audio"], [1.5])


def test_audio_tfrecords_roundtrip(tmp_path):
    path = str(tmp_path / "wave.tfrecords")
    waves = np.random.RandomState(0).randn(5, 256).astype(np.float32)
    write_audio_tfrecords(path, waves)
    out = read_audio_tfrecords(path)
    np.testing.assert_array_equal(out, waves)
    # padding / truncation
    np.testing.assert_array_equal(read_audio_tfrecords(path, 128),
                                  waves[:, :128])
    padded = read_audio_tfrecords(path, 300)
    np.testing.assert_array_equal(padded[:, :256], waves)
    assert (padded[:, 256:] == 0).all()


def test_append_mode_extends_file(tmp_path):
    """append=True is a plain record concatenation (the chunked multi-GB
    synthesizer/ETL flush path): the extended file reads back as one
    seamless dataset, CRCs intact."""
    path = str(tmp_path / "app.tfrecords")
    rng = np.random.RandomState(1)
    a, b = (rng.randn(3, 64).astype(np.float32) for _ in range(2))
    write_audio_tfrecords(path, a)
    write_audio_tfrecords(path, b, append=True)
    out = read_audio_tfrecords(path)
    np.testing.assert_array_equal(out, np.concatenate([a, b]))


def _write_nsynth_fixture(path, n=12):
    """Synthesize a miniature NSynth-schema TFRecord."""
    rng = np.random.RandomState(0)
    fams = [b"guitar", b"organ", b"flute"]
    payloads = []
    for i in range(n):
        payloads.append(encode_example({
            "note": np.array([i], np.int64),
            "pitch": np.array([50 if i % 2 == 0 else 60], np.int64),
            "sample_rate": np.array([16000], np.int64),
            "instrument_source_str": [b"acoustic"],
            "instrument_family_str": [fams[i % 3]],
            "audio": rng.randn(1000).astype(np.float32),
        }))
    write_records(path, payloads)


def test_nsynth_filtering(tmp_path):
    path = str(tmp_path / "nsynth.tfrecord")
    _write_nsynth_fixture(path)
    # pitch filter: i even -> pitch 50 (6 of 12)
    ds = NSynthDataset(path, pitch=50)
    assert ds.load_audio(length=1000).shape == (6, 1000)
    # instrument filter: guitar at i % 3 == 0 (4 of 12)
    ds = NSynthDataset(path, instrument="guitar")
    assert ds.load_audio(length=1000).shape == (4, 1000)
    # combined: guitar AND pitch 50 -> i in {0, 6} (2)
    ds = NSynthDataset(path, instrument="guitar", pitch=50)
    assert ds.load_audio(length=2048).shape == (2, 2048)


def test_nsynth_load_audio_skip_chunks(tmp_path):
    """`skip` pages through matches (chunked ETL): consecutive
    (skip, max_examples) windows tile the full load, and a fully-consumed
    tail returns an empty array instead of raising."""
    path = str(tmp_path / "nsynth.tfrecord")
    _write_nsynth_fixture(path)
    ds = NSynthDataset(path, pitch=50)
    full = ds.load_audio(length=500)
    parts = [ds.load_audio(length=500, max_examples=4, skip=s)
             for s in (0, 4)]
    np.testing.assert_array_equal(np.concatenate(parts), full)
    assert ds.load_audio(length=500, max_examples=4, skip=6).shape \
        == (0, 500)
    # skip=0 with no matches still raises
    with pytest.raises(IOError):
        NSynthDataset(path, pitch=99).load_audio(length=500)


def test_nsynth_validation(tmp_path):
    with pytest.raises(ValueError):
        NSynthDataset("x", instrument="banjo")
    with pytest.raises(ValueError):
        NSynthDataset("x", pitch=500)


def test_get_audio_tfrecord_branch(tmp_path):
    cfg = CMPSConfig(minibatch_size=4)
    waves = np.random.RandomState(1).randn(10, 512).astype(np.float32)
    write_audio_tfrecords(str(tmp_path / "guitar.tfrecords"), waves)
    it = get_audio(str(tmp_path), "guitar", cfg, sample_duration=512)
    batch = next(it)
    assert batch.shape == (4, 512)
    # batches draw from the dataset rows
    row_set = {tuple(np.round(w, 5)) for w in waves}
    assert all(tuple(np.round(np.asarray(b), 5)) in row_set for b in batch)


def test_get_audio_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_audio(str(tmp_path), "guitar", CMPSConfig(), sample_duration=64)


def test_streaming_iterator(tmp_path):
    from audio_mps_tpu.data.pipeline import iter_audio_tfrecords
    path = str(tmp_path / "big.tfrecords")
    waves = np.random.RandomState(0).randn(50, 64).astype(np.float32)
    write_audio_tfrecords(path, waves)
    it = iter_audio_tfrecords(path, batch_size=8, sample_duration=64,
                              shuffle_buffer=16, repeat=True)
    seen = set()
    for _ in range(10):
        b = next(it)
        assert b.shape == (8, 64)
        for row in b:
            seen.add(round(float(row[0]), 5))
    # shuffle buffer cycles through the dataset
    assert len(seen) > 30

    # non-repeat drains cleanly
    it2 = iter_audio_tfrecords(path, batch_size=10, sample_duration=64,
                               shuffle_buffer=8, repeat=False)
    n = sum(b.shape[0] for b in it2)
    assert n == 50


def test_decoder_fuzz_no_crash():
    """Random garbage must never crash either decoder (worst case: empty
    or partial dict / None)."""
    from audio_mps_tpu import native
    rng = np.random.RandomState(0)
    for n in [0, 1, 3, 17, 256]:
        for _ in range(200):
            buf = rng.bytes(n)
            try:
                decode_example(buf)
            except (IndexError, ValueError):
                pass   # malformed input may raise, must not hang/crash
            if native.available():
                native.parse_float_feature(buf, "audio")
