"""Native audio decoding for webdataset tar members.

TPU-native replacement for the reference's torchaudio-based AudioDecoder
(data/dataloader/audio_decode.py:17-49; selected by its dataloader when
decoder_type == "audio", dataloader.py:128, but unused by every T2V
recipe). Decoding rides the same C++ libav library as video
(native/videoio::vio_decode_audio): in-memory blob -> resampled planar
float32 PCM, no torch/torchaudio on the data path.

Semantics mirror the reference:
  - accepts wav / flac / mp3 / m4a tar members, returns None for others
    (webdataset "skip this field" protocol),
  - resamples to `sample_rate` (reference default 48 kHz),
  - truncates/pads to `max_length` seconds and reports a pad mask.

One deliberate deviation: the reference marks the FIRST `pad_start`
entries of audio_pad_masks even though it appends padding at the END
(audio_decode.py:40-43) — a bug with no consumer anywhere in the repo.
Here audio_pad_masks[i] == 1.0 exactly where sample i is padding.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from . import videoio

AUDIO_EXTENSIONS = ("mp3", "wav", "flac", "m4a")


def decode_audio(
    data: bytes,
    sample_rate: int = 48000,
    num_channels: Optional[int] = None,
    max_length: float = 10.0,
) -> Tuple[np.ndarray, dict]:
    """Decode an in-memory audio blob -> ((C, S) float32, info).

    S is the true decoded length, capped at max_length*sample_rate (the
    native decoder stops reading once the cap is hit, so an hour-long file
    costs 10 seconds of decode). num_channels=None keeps the stream
    layout; num_channels=1 downmixes.
    """
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive (the output "
                         "allocation is sized from it)")
    lib = videoio._load()
    max_samples = int(round(max_length * sample_rate))
    nch_req = int(num_channels or 0)
    # initial row allocation when keeping the stream layout: stereo covers
    # nearly all real audio, and the C side refuses (rc=-2, reporting the
    # real count) rather than overflow, so we re-allocate once for the rare
    # multichannel stream instead of zeroing 8 rows (15 MB at the defaults)
    # on every decode
    alloc_ch = nch_req if nch_req > 0 else 2
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    got_ch = ctypes.c_int(0)
    src_rate = ctypes.c_int(0)
    while True:
        out = np.zeros((alloc_ch, max_samples), np.float32)
        got = lib.vio_decode_audio(
            buf,
            len(data),
            sample_rate,
            nch_req,
            alloc_ch,
            max_samples,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(got_ch),
            ctypes.byref(src_rate),
        )
        if got == -2 and got_ch.value > alloc_ch:
            alloc_ch = got_ch.value
            continue
        break
    if got < 0:
        raise IOError(f"decode_audio: {videoio._err(lib)}")
    info = {
        "original_sample_rate": src_rate.value,
        "sample_rate": sample_rate,
        "num_samples": int(got),
    }
    return out[: got_ch.value, : int(got)].copy(), info


class AudioDecoder:
    """webdataset field decoder: __call__(key, data) -> (waveform, info).

    Drop-in for the reference class (audio_decode.py:17): returns None for
    non-audio extensions; otherwise a (C, max_length*sample_rate) float32
    waveform (end-padded with zeros) and an info dict with
    audio_pad_masks / original_sample_rate / sample_rate.
    """

    def __init__(
        self,
        sample_rate: int = 48000,
        num_channels: Optional[int] = None,
        extension: str = "wav",  # reference keeps this for backend choice;
        max_length: int = 10,    # the native decoder needs no backend switch
    ):
        del extension
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.max_length = max_length

    def __call__(self, key: str, data: bytes):
        extension = key.split(".")[-1].lower()
        if extension not in AUDIO_EXTENSIONS:
            return None
        wav, info = decode_audio(
            data,
            sample_rate=self.sample_rate,
            num_channels=self.num_channels,
            max_length=float(self.max_length),
        )
        total = self.max_length * self.sample_rate
        n = wav.shape[1]
        pad_masks = np.zeros((total,), np.float32)
        if n < total:
            wav = np.pad(wav, ((0, 0), (0, total - n)))
            pad_masks[n:] = 1.0
        info["audio_pad_masks"] = pad_masks
        return wav, info
