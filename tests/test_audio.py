"""Native audio decoding (data/audioio.py + native/videoio vio_decode_audio).

Mirrors the reference AudioDecoder surface (data/dataloader/audio_decode.py:
17-49): in-memory blob -> resampled float32 waveform + pad mask, without
torch/torchaudio. WAV fixtures are written with the stdlib wave module so
the tests stay self-contained.
"""

import io
import wave

import numpy as np
import pytest

from t2v_turbo_tpu.data import audioio, videoio

pytestmark = pytest.mark.skipif(
    not videoio.available(), reason="native videoio not built"
)


def make_wav(sr=16000, dur=0.5, freqs=(440.0, 880.0), amp=0.5) -> bytes:
    t = np.arange(int(sr * dur)) / sr
    chans = [
        (amp * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
        for f in freqs
    ]
    pcm = np.stack(chans, -1).reshape(-1)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(len(freqs))
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return bio.getvalue()


def dominant_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x))
    return float(np.fft.rfftfreq(x.shape[0], 1 / sr)[np.argmax(spec)])


class TestDecodeAudio:
    def test_resample_preserves_content(self):
        data = make_wav(sr=16000, dur=0.5)
        wav, info = audioio.decode_audio(data, sample_rate=48000)
        assert wav.shape == (2, 24000)  # 0.5 s at 48 kHz, stereo
        assert wav.dtype == np.float32
        assert info["original_sample_rate"] == 16000
        assert info["sample_rate"] == 48000
        # per-channel tones survive the 3x resample
        assert abs(dominant_freq(wav[0], 48000) - 440.0) < 2.0
        assert abs(dominant_freq(wav[1], 48000) - 880.0) < 2.0
        # int16 full-scale 0.5-amp sine -> ~0.5 float peak
        assert 0.4 < np.abs(wav).max() < 0.6

    def test_same_rate_passthrough(self):
        data = make_wav(sr=22050, dur=0.25, freqs=(330.0,))
        wav, info = audioio.decode_audio(data, sample_rate=22050)
        assert info["original_sample_rate"] == 22050
        assert wav.shape[0] == 1
        assert abs(wav.shape[1] - 5512) <= 2
        assert abs(dominant_freq(wav[0], 22050) - 330.0) < 4.0

    def test_rate_must_be_positive(self):
        with pytest.raises(ValueError):
            audioio.decode_audio(make_wav(), sample_rate=0)

    def test_mono_downmix(self):
        data = make_wav(sr=16000, dur=0.5)
        wav, _ = audioio.decode_audio(
            data, sample_rate=16000, num_channels=1
        )
        assert wav.shape == (1, 8000)

    def test_truncates_at_max_length(self):
        data = make_wav(sr=16000, dur=2.0, freqs=(440.0,))
        wav, info = audioio.decode_audio(
            data, sample_rate=16000, max_length=0.5
        )
        assert wav.shape == (1, 8000)
        assert info["num_samples"] == 8000

    def test_garbage_raises(self):
        with pytest.raises(IOError):
            audioio.decode_audio(b"not audio at all" * 64)


class TestAudioDecoder:
    def test_webdataset_protocol(self):
        dec = audioio.AudioDecoder(sample_rate=48000, max_length=2)
        out = dec("000123.wav", make_wav(sr=16000, dur=0.5))
        assert out is not None
        wav, info = out
        assert wav.shape == (2, 96000)  # padded to max_length
        mask = info["audio_pad_masks"]
        assert mask.shape == (96000,)
        # exactly the padded tail is masked (NOT the reference's
        # head-mask quirk, see audioio.py docstring)
        assert mask[:24000].sum() == 0
        assert mask[24000:].all()
        assert np.all(wav[:, 24000:] == 0)

    def test_non_audio_key_skipped(self):
        dec = audioio.AudioDecoder()
        assert dec("000123.txt", b"caption") is None
        assert dec("000123.mp4", b"\x00" * 100) is None

    def test_long_clip_truncated(self):
        dec = audioio.AudioDecoder(sample_rate=8000, max_length=1)
        wav, info = dec("a.wav", make_wav(sr=8000, dur=3.0, freqs=(200.0,)))
        assert wav.shape == (1, 8000)
        assert info["audio_pad_masks"].sum() == 0
