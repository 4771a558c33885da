"""Generate tests/fixtures/synth_16k.wav — a deterministic 16 kHz fixture.

VERDICT r1 #6: the recorded-trace set only covered 11025/44100 Hz material;
a 16 kHz fixture catches sample-rate-dependent regressions (lag windows,
mel filterbank edges, resample ratios). Two concatenated synthetic vowels
(source-filter, known formants) with different f0 — same shape as the
bundled sample-two_vowels.wav but synthesized, so it is redistributable and
bit-reproducible (fixed seeds).
"""

import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from util import synth_vowel  # noqa: E402

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def main():
    sr = 16000
    n = 8000  # 0.5 s per vowel
    a = synth_vowel(sr, 116.0, [(730.0, 60.0), (1090.0, 80.0), (2440.0, 120.0)], n,
                    noise=0.015, seed=161)
    i = synth_vowel(sr, 205.0, [(270.0, 50.0), (2290.0, 90.0), (3010.0, 150.0)], n,
                    noise=0.015, seed=162)
    ramp = np.minimum(1.0, np.arange(n) / 400.0)  # de-click fades
    env = ramp * ramp[::-1] * 2  # clipped at 1 by minimum below
    env = np.minimum(env, 1.0)
    x = np.concatenate([a * env, i * env])
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")

    path = os.path.join(FIX, "synth_16k.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    print(f"wrote {path}: {len(pcm)} samples @ {sr} Hz")


if __name__ == "__main__":
    main()
