"""Tests for the Viterbi pitch path search."""

import numpy as np
import jax.numpy as jnp

from voxtpu.viterbi import PathConfig, pitch_path, pitch_track, take_best
from voxtpu.windows import hann

from util import sine_hz


def test_smooth_path_beats_octave_error():
    # Frame 1 has a slightly stronger octave-down candidate; a greedy picker
    # jumps an octave, the Viterbi path does not.
    freq = jnp.asarray(
        [
            [200.0, 100.0, 0.0],
            [100.5, 201.0, 0.0],
            [202.0, 101.0, 0.0],
        ]
    )
    strength = jnp.asarray(
        [
            [0.95, 0.60, 0.20],
            [0.93, 0.90, 0.20],
            [0.95, 0.60, 0.20],
        ]
    )
    valid = jnp.ones((3, 3), dtype=bool)
    cfg = PathConfig(ceiling=600.0, octave_jump_cost=0.35)

    greedy_f, _ = take_best(freq, strength)
    assert float(greedy_f[1]) == 100.5  # greedy takes the strongest

    f0, s0 = pitch_path(freq, strength, valid, cfg)
    got = np.asarray(f0)
    np.testing.assert_allclose(got, [200.0, 201.0, 202.0])


def test_voiced_unvoiced_cost_suppresses_flicker():
    # A single weakly-voiced frame between unvoiced frames gets smoothed out.
    freq = jnp.asarray([[0.0, 150.0], [0.0, 150.0], [0.0, 150.0]])
    strength = jnp.asarray([[0.9, 0.05], [0.44, 0.45], [0.9, 0.05]])
    valid = jnp.ones((3, 2), dtype=bool)
    cfg = PathConfig(voiced_unvoiced_cost=0.5)
    f0, _ = pitch_path(freq, strength, valid, cfg)
    np.testing.assert_allclose(np.asarray(f0), [0.0, 0.0, 0.0])


def test_pitch_track_sine():
    sr = 11025.0
    n, hop, F = 512, 256, 8
    x = sine_hz(220.0, sr, (F - 1) * hop + n)
    frames = np.stack([x[i * hop : i * hop + n] for i in range(F)]) * np.asarray(hann(n))
    f0, s0 = pitch_track(jnp.asarray(frames), sr, fmin=100.0, fmax=500.0)
    np.testing.assert_allclose(np.asarray(f0), 220.0, rtol=5e-3)


def test_path_matches_brute_force():
    rng = np.random.default_rng(0)
    F, C = 6, 3
    freq = np.where(rng.random((F, C)) < 0.3, 0.0, rng.uniform(80, 400, (F, C)))
    strength = rng.uniform(0.1, 1.0, (F, C))
    cfg = PathConfig()

    f0, _ = pitch_path(jnp.asarray(freq), jnp.asarray(strength), jnp.ones((F, C), bool), cfg)

    # brute force over all C^F paths
    import itertools

    def local(f, s):
        return s - cfg.octave_cost * np.log2(cfg.ceiling / f) if f > 0 else s

    def tcost(fp, fc):
        if fp > 0 and fc > 0:
            return cfg.octave_jump_cost * abs(np.log2(fp / fc))
        if (fp > 0) != (fc > 0):
            return cfg.voiced_unvoiced_cost
        return 0.0

    best, best_score = None, -np.inf
    for path in itertools.product(range(C), repeat=F):
        sc = sum(local(freq[t, c], strength[t, c]) for t, c in enumerate(path))
        sc -= sum(tcost(freq[t, path[t]], freq[t + 1, path[t + 1]]) for t in range(F - 1))
        if sc > best_score:
            best, best_score = path, sc

    exp = np.asarray([freq[t, c] for t, c in enumerate(best)])
    np.testing.assert_allclose(np.asarray(f0), exp)
