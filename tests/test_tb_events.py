"""TensorBoard event export (utils/tb_events.py).

The reference's observability is TB-native (monitors.py:50-86,
vae_monitor.py:140-156, prior.py:309-316); these tests pin that our
dependency-free writer emits files TensorBoard actually reads: a fast
structural check of the TFRecord framing + CRCs, and a slow round-trip
through TF's own summary_iterator (TF 2.21 is in-env as the reference's
runtime, not a framework dependency).
"""

import struct

import numpy as np
import pytest

from vae_music_tpu.utils.tb_events import TBEventWriter, _masked_crc, crc32c


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (data_crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert data_crc == _masked_crc(payload)
        records.append(payload)
        off += 12 + length + 4
    return records


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors for CRC32C (Castagnoli).
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


def test_event_file_structure(tmp_path):
    tb = TBEventWriter(str(tmp_path))
    tb.scalar("train/loss", 0.5, 3)
    tb.audio("samples/a", np.zeros(100, np.float32), 3000, 3)
    tb.histogram("param/w", np.random.default_rng(0).normal(size=256), 3)
    tb.close()

    records = _read_records(tb.path)
    assert len(records) == 4                       # file_version + 3 events
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    assert b"samples/a" in records[2] and b"audio/wav" in records[2]
    assert b"param/w" in records[3]


@pytest.mark.slow
def test_round_trip_through_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")

    tb = TBEventWriter(str(tmp_path))
    tb.scalar("train/loss", 0.25, 7)
    tb.scalar("train/loss", 0.125, 8)
    wav = np.sin(np.linspace(0, 40, 300)).astype(np.float32)
    tb.audio("samples/sine", wav, 3000, 7)
    tb.histogram("grads/w", np.arange(100, dtype=np.float64), 7)
    tb.close()

    events = list(tf.compat.v1.train.summary_iterator(tb.path))
    assert events[0].file_version == "brain.Event:2"

    scalars = [(e.step, v.tag, v.simple_value)
               for e in events for v in e.summary.value
               if v.HasField("simple_value")]
    assert (7, "train/loss", 0.25) in scalars
    assert (8, "train/loss", 0.125) in scalars

    audios = [(e.step, v.tag, v.audio) for e in events
              for v in e.summary.value if v.HasField("audio")]
    assert len(audios) == 1
    step, tag, audio = audios[0]
    assert (step, tag) == (7, "samples/sine")
    assert audio.sample_rate == 3000.0
    assert audio.length_frames == 300
    assert audio.content_type == "audio/wav"
    # decode the embedded WAV and compare to the source signal
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(audio.encoded_audio_string)) as f:
        assert f.getframerate() == 3000
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    np.testing.assert_allclose(pcm / 32767.0, wav, atol=1e-4)

    histos = [(e.step, v.tag, v.histo) for e in events
              for v in e.summary.value if v.HasField("histo")]
    assert len(histos) == 1
    step, tag, h = histos[0]
    assert (step, tag) == (7, "grads/w")
    assert h.min == 0.0 and h.max == 99.0 and h.num == 100.0
    assert sum(h.bucket) == 100.0


def test_monitor_tensorboard_mirror(tmp_path):
    """VQVAEMonitor(tensorboard=True) writes an event file with the same
    scalars the JSONL gets."""
    import glob

    from vae_music_tpu.train.monitors import VQVAEMonitor

    class _State:
        step = 5
        codebooks = ()

    mon = VQVAEMonitor(str(tmp_path), tensorboard=True)
    mon.on_step(0, {"loss": 2.0})
    mon.on_step(1, {"loss": 1.0})
    mon.on_epoch_end(1, _State())
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert any(b"train/loss" in r for r in records)
