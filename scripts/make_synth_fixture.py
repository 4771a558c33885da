"""Generate deterministic synthetic two-vowel fixtures at arbitrary rates.

Extends the 16 kHz fixture idea (make_synth16k_fixture.py, VERDICT r1 #6) to
more sample rates: rate-dependent code paths (lag windows, mel filterbank
edges, candidate banding, Burg conditioning) get recorded-trace coverage at
8/16/48 kHz on top of the bundled 11025/44100 Hz material.

Run: python scripts/make_synth_fixture.py  (writes synth_8k.wav, synth_48k.wav)
"""

import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from util import synth_vowel  # noqa: E402

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def make(sr: int, name: str, seconds_per_vowel: float = 0.5, seed0: int = 481):
    n = int(sr * seconds_per_vowel)
    a = synth_vowel(sr, 116.0, [(730.0, 60.0), (1090.0, 80.0), (2440.0, 120.0)], n,
                    noise=0.015, seed=seed0)
    i = synth_vowel(sr, 205.0, [(270.0, 50.0), (2290.0, 90.0), (3010.0, 150.0)], n,
                    noise=0.015, seed=seed0 + 1)
    fade = max(64, sr // 40)
    ramp = np.minimum(1.0, np.arange(n) / fade)
    env = np.minimum(ramp * ramp[::-1] * 2, 1.0)
    x = np.concatenate([a * env, i * env])
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    path = os.path.join(FIX, name)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    print(f"wrote {path}: {len(pcm)} samples @ {sr} Hz")


def main():
    # 8 kHz: telephony-band; the i-vowel's F3 (3010 Hz) sits just under
    # Nyquist. 48 kHz: the pro-audio rate above the bundled 44.1k.
    make(8000, "synth_8k.wav", seed0=81)
    make(48000, "synth_48k.wav", seed0=481)


if __name__ == "__main__":
    main()
