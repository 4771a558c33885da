"""Pitch detection example, mirroring the reference's
examples/pitch_detection.rs: a 150 Hz sine at 44.1 kHz, Hann frames of 2048
with hop 1024, Boersma candidates per frame.

Where the reference loops `Windower::hanning` chunks and calls pitch() per
frame (13 ms each), here the whole signal is one batched call.

Run: python examples/pitch_detection.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from voxtpu.frame import frame_signal
from voxtpu.pitch import pitch_frames


def main():
    exp_freq = 150.0
    sr = 44100.0
    n, hop = 2048, 1024
    t = np.arange(int(n + 1)) / sr
    signal = np.sin(2 * np.pi * exp_freq * t)

    frames = frame_signal(jnp.asarray(signal), n, hop, window="hanning")
    freq, strength, valid = pitch_frames(
        frames, sr, threshold=0.2, fmin=100.0, fmax=500.0
    )
    for i in range(frames.shape[0]):
        f = np.asarray(freq)[i][np.asarray(valid)[i]]
        s = np.asarray(strength)[i][np.asarray(valid)[i]]
        print(f"frame {i}: best f0 = {f[0]:.4f} Hz (strength {s[0]:.4f}), "
              f"{len(f)} candidates")


if __name__ == "__main__":
    main()
