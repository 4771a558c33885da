"""Tests for the Viterbi pitch path search.

The cost definitions are pinned to an INDEPENDENT scalar transcription of
Boersma (1993) §4 (tests/reference_impl.py boersma_* — transcribed from the
paper's equations, not from voxtpu/viterbi.py), so a transcription error in
the implementation cannot self-validate (VERDICT r2 #5)."""

import os

import numpy as np
import jax.numpy as jnp

import reference_impl as ri
from voxtpu.viterbi import PathConfig, pitch_path, pitch_track, take_best
from voxtpu.windows import hann

from util import sine_hz


def _oracle_f0(freq, strength, valid, intensity, cfg: PathConfig):
    path = ri.boersma_pitch_path(
        np.asarray(freq), np.asarray(strength), np.asarray(valid),
        intensity=None if intensity is None else np.asarray(intensity),
        silence_threshold=cfg.silence_threshold,
        voicing_threshold=cfg.voicing_threshold,
        octave_cost=cfg.octave_cost,
        octave_jump_cost=cfg.octave_jump_cost,
        voiced_unvoiced_cost=cfg.voiced_unvoiced_cost,
        ceiling=cfg.ceiling,
    )
    f = np.asarray(freq)
    s = np.asarray(strength)
    F = f.shape[0]
    return (np.asarray([f[t, path[t]] for t in range(F)]),
            np.asarray([s[t, path[t]] for t in range(F)]))


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


def test_path_matches_boersma_oracle_16k_fixture():
    """Frame-for-frame agreement with the paper-transcribed oracle on the
    16 kHz two-vowel fixture, silence-aware intensity included."""
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.pitch import pitch_frames

    wav = read_wav(os.path.join(os.path.dirname(__file__), "fixtures", "synth_16k.wav"))
    sr = float(wav.sample_rate)
    n, hop = 512, 256
    frames = frame_signal(jnp.asarray(wav.samples), n, hop)
    w = jnp.asarray(hann(n), dtype=frames.dtype)
    freq, strength, valid = pitch_frames(
        frames * w, sr, threshold=0.2, fmin=80.0, fmax=400.0, max_candidates=16
    )
    local_peak = np.max(np.abs(np.asarray(frames)), axis=-1)
    intensity = local_peak / max(local_peak.max(), 1e-30)
    cfg = PathConfig(ceiling=400.0)

    f0, s0 = pitch_path(freq, strength, valid, cfg,
                        local_intensity=jnp.asarray(intensity))
    exp_f, exp_s = _oracle_f0(freq, strength, valid, intensity, cfg)
    np.testing.assert_array_equal(np.asarray(f0), exp_f)
    np.testing.assert_array_equal(np.asarray(s0), exp_s)
    # the fixture's two vowels (116/205 Hz) must actually be tracked
    voiced = exp_f[exp_f > 0]
    assert len(voiced) > 40
    assert np.any(np.abs(voiced - 116.0) < 5.0)
    assert np.any(np.abs(voiced - 205.0) < 8.0)


def test_path_matches_boersma_oracle_silence_segment():
    """Silence-aware unvoiced strength (eq. 23): a voiced half followed by a
    near-silent half — the oracle and the implementation must agree frame for
    frame, and the silent half must come out unvoiced."""
    from voxtpu.frame import frame_signal
    from voxtpu.pitch import pitch_frames

    rng = np.random.default_rng(13)
    sr = 16000.0
    n, hop = 512, 256
    t = np.arange(24 * hop + n) / sr
    x = np.sin(2 * np.pi * 170.0 * t)
    half = len(x) // 2
    x[half:] = 0.0008 * rng.standard_normal(len(x) - half)
    frames = frame_signal(jnp.asarray(x), n, hop)
    w = jnp.asarray(hann(n), dtype=frames.dtype)
    freq, strength, valid = pitch_frames(
        frames * w, sr, threshold=0.2, fmin=80.0, fmax=400.0, max_candidates=16
    )
    local_peak = np.max(np.abs(np.asarray(frames)), axis=-1)
    intensity = local_peak / max(local_peak.max(), 1e-30)
    cfg = PathConfig(ceiling=400.0)

    f0, _ = pitch_path(freq, strength, valid, cfg,
                       local_intensity=jnp.asarray(intensity))
    exp_f, _ = _oracle_f0(freq, strength, valid, intensity, cfg)
    np.testing.assert_array_equal(np.asarray(f0), exp_f)
    assert np.all(np.abs(exp_f[:6] - 170.0) < 2.0), exp_f
    assert np.all(exp_f[-6:] == 0.0), exp_f


def test_path_matches_boersma_oracle_octave_jump():
    """Octave-jump costs: alternating strong octave-down candidates force the
    DP to weigh jump cost vs local strength; implementation == oracle, and the
    chosen track must not alternate octaves."""
    F, C = 12, 4
    freq = np.zeros((F, C))
    strength = np.zeros((F, C))
    for t in range(F):
        # candidate 0: the true 200 Hz track; candidate 1: the octave-down
        # 100 Hz, slightly stronger on odd frames (the lag-window boost
        # pattern); candidate 2: unvoiced; candidate 3: a weak 300 Hz decoy.
        freq[t] = [200.0 + t, 100.0 + 0.5 * t, 0.0, 300.0]
        bonus = 0.03 if t % 2 else -0.02
        strength[t] = [0.90, 0.90 + bonus, 0.20, 0.55]
    valid = np.ones((F, C), dtype=bool)
    intensity = np.ones(F)
    cfg = PathConfig(ceiling=600.0)

    f0, _ = pitch_path(jnp.asarray(freq), jnp.asarray(strength),
                       jnp.asarray(valid), cfg,
                       local_intensity=jnp.asarray(intensity))
    exp_f, _ = _oracle_f0(freq, strength, valid, intensity, cfg)
    np.testing.assert_array_equal(np.asarray(f0), exp_f)
    # a greedy picker would alternate octaves every frame; the path must not
    octaves = np.abs(np.diff(np.log2(exp_f)))
    assert np.all(octaves < 0.5), exp_f


def test_path_matches_boersma_oracle_no_intensity():
    """local_intensity=None branch (raw-strength unvoiced): random candidate
    fields, implementation == oracle."""
    rng = np.random.default_rng(3)
    F, C = 20, 8
    freq = np.where(rng.random((F, C)) < 0.3, 0.0, rng.uniform(80, 500, (F, C)))
    strength = rng.uniform(0.0, 1.0, (F, C))
    valid = rng.random((F, C)) < 0.9
    valid[:, 0] = True
    cfg = PathConfig()
    f0, s0 = pitch_path(jnp.asarray(freq), jnp.asarray(strength),
                        jnp.asarray(valid), cfg)
    exp_f, exp_s = _oracle_f0(freq, strength, valid, None, cfg)
    np.testing.assert_array_equal(np.asarray(f0), exp_f)
    np.testing.assert_array_equal(np.asarray(s0), exp_s)


def test_pitch_path_host_matches_device_random():
    """The NumPy serving twin must be bit-identical to pitch_path (same op
    order, same first-win argmax ties) — random candidates, with and without
    the silence-aware intensity."""
    from voxtpu.viterbi import pitch_path_host

    rng = np.random.default_rng(11)
    for trial in range(6):
        F, C = int(rng.integers(2, 60)), int(rng.integers(2, 12))
        freq = np.where(
            rng.random((F, C)) < 0.3, 0.0, rng.uniform(80, 400, (F, C))
        )
        strength = rng.uniform(-0.5, 1.0, (F, C))
        valid = rng.random((F, C)) < 0.9
        valid[:, 0] = True
        li = rng.uniform(0.0, 1.0, F) if trial % 2 else None
        cfg = PathConfig()
        args = (jnp.asarray(freq), jnp.asarray(strength), jnp.asarray(valid))
        f0_d, s0_d = pitch_path(*args, cfg, local_intensity=li)
        f0_h, s0_h = pitch_path_host(freq, strength, valid, cfg, local_intensity=li)
        np.testing.assert_array_equal(np.asarray(f0_d), f0_h, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(s0_d), s0_h, err_msg=f"trial {trial}")


def test_pitch_path_host_single_frame():
    from voxtpu.viterbi import pitch_path_host

    freq = np.asarray([[0.0, 120.0]])
    strength = np.asarray([[0.2, 0.9]])
    f0, s0 = pitch_path_host(freq, strength, np.ones((1, 2), bool))
    assert f0[0] == 120.0 and s0[0] == 0.9


def test_device_dp_over_padded_frames_is_not_neutral():
    """The motivation for the host twin (and the serving fix): appending
    zero-padded unvoiced-only frames to the DP changes the last REAL frames'
    path — a voiced candidate at the boundary pays voiced_unvoiced_cost into
    the pad tail while an unvoiced one pays nothing."""
    from voxtpu.viterbi import pitch_path_host

    F, C = 4, 2
    # Last real frame: voiced barely beats unvoiced locally.
    freq = np.tile(np.asarray([[150.0, 0.0]]), (F, 1))
    # Boundary margin: voiced local = 0.532 - 0.01*log2(4) = 0.512; the
    # unvoiced path pays vuc=0.14 entering unvoiced (0.52 - 0.14 = 0.38),
    # so unpadded margin is 0.132 < vuc — exactly the knife the pad flips.
    strength = np.asarray([[0.9, 0.1]] * (F - 1) + [[0.532, 0.52]])
    valid = np.ones((F, C), bool)
    cfg = PathConfig()
    f0_real, _ = pitch_path_host(freq, strength, valid, cfg)
    # Pad with unvoiced-only frames (what bucket padding produces).
    pad = 8
    freq_p = np.concatenate([freq, np.zeros((pad, C))])
    strength_p = np.concatenate([strength, np.full((pad, C), 0.2)])
    valid_p = np.concatenate([valid, np.tile([False, True], (pad, 1)).astype(bool)])
    f0_pad, _ = pitch_path_host(freq_p, strength_p, valid_p, cfg)
    assert f0_real[-1] > 0.0, "setup: last real frame should be voiced unpadded"
    assert f0_pad[F - 1] == 0.0, "setup: padding should flip the boundary frame"
