"""Minimal pure-stdlib WAV (RIFF PCM) codec — 16-bit little-endian PCM.

The audio twin of ``functions.png``: real multimodal decode with zero
third-party dependencies, from the public RIFF/WAVE format description.
The fixture files are valid WAV containers (RIFF header, fmt chunk, data
chunk) and the decoder actually parses chunk structure and PCM frames —
``pyav``/``soundfile``, when present on executors, handle arbitrary
real-world audio; this codec is the guaranteed-available fallback and the
fixture generator.
"""

from __future__ import annotations

import struct


def wav_encode(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Encode 16-bit PCM samples (interleaved if multi-channel) as WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit PCM WAV to ``(sample_rate, n_channels, samples)``.
    Walks the RIFF chunk list (tolerating extra chunks like LIST/fact);
    raises ``ValueError`` outside the PCM-16 subset."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        # bounds-check the declared length so truncated/oversized chunk
        # fields raise the documented ValueError, never struct.error
        if pos + 8 + length > len(data):
            raise ValueError(
                f"truncated WAV: chunk length {length} exceeds remaining data"
            )
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError(f"bad fmt chunk length {len(payload)}")
            fmt_code, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV subset: need PCM-16, got code={fmt_code} bits={bits}"
                )
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm[: len(pcm) & ~1]))
    return sample_rate, n_channels, samples
