"""Scalar NumPy oracle: a direct, per-frame transcription of the reference
semantics (/root/reference/src/*.rs), used as the ground truth for
frame-for-frame parity tests of the batched JAX implementation on real audio.

This is intentionally slow, allocation-happy Python — its only job is to
mirror the Rust control flow exactly, quirks included. Each function cites the
reference lines it transcribes.
"""

from __future__ import annotations

import math

import numpy as np


# --- waves.rs ---------------------------------------------------------------

def preemphasis(x: np.ndarray, factor: float) -> np.ndarray:
    """waves.rs:86-96 (backwards, uses updated following sample)."""
    x = x.copy()
    f = 2.0 * math.pi * factor
    last = x[-1]
    for i in range(len(x) - 2, -1, -1):
        x[i] = x[i] + last * f
        last = x[i]
    return x


def normalize(x: np.ndarray) -> np.ndarray:
    """waves.rs:68-76 (divide by max |x|)."""
    return x / np.max(np.abs(x))


# --- window tables ----------------------------------------------------------

def hanning(n: int) -> np.ndarray:
    """sample crate Hanning at phase i/n (lib.rs:66-70 convention)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def hanning_lag(n: int) -> np.ndarray:
    """periodic.rs:236-248."""
    phi = np.arange(n) / n
    v = 2.0 * np.pi * phi
    return (1.0 - phi) * (2.0 / 3.0 + np.cos(v) / 3.0) + np.sin(v) / (2.0 * np.pi)


# --- periodic.rs ------------------------------------------------------------

def autocorrelate(x: np.ndarray, n_coeffs: int) -> np.ndarray:
    """periodic.rs:276-289 (seed-term quirk)."""
    out = np.empty(n_coeffs, dtype=np.float64)
    for lag in range(n_coeffs):
        acc = x[0]
        for i in range(1, len(x) - lag):
            acc = acc + x[i] * x[i + lag]
        out[lag] = acc
    return out


def interpolate_sinc(y: np.ndarray, offset: int, nx: int, x: float, max_depth: int) -> float:
    """periodic.rs:29-87, verbatim (including clipping and clamped indexing)."""
    nl = int(math.floor(x))
    nr = nl + 1
    phil = x - nl
    phir = 1.0 - phil
    result = 0.0

    if nx < 1:
        return float("nan")
    if x > nx:
        return float(y[offset + nx - 1])
    if x < 0.0:
        return float(y[0])
    if abs(x - nl) < 1.0e-10:
        return float(y[offset + nl])
    if abs(x - nr) < 1.0e-10:
        return float(y[offset + nr])

    if (offset + nr) < max_depth:
        max_depth = 0 if (offset + nr) < 0 else offset + nr
    if (offset + nl + max_depth) >= nx:
        max_depth = nx - offset + nl - 1

    for n in range(max_depth + 1):
        a = math.pi * (phil + n)
        lag_val = offset + nr - n
        if lag_val < 0:
            lag_val = 0
        r_lag = float(y[lag_val])
        first = math.sin(a) / a
        second = 0.5 + 0.5 * math.cos(a / (phil + max_depth))
        result += r_lag * first * second

        a = math.pi * (phir + n)
        lag_val = offset + nl + n
        if lag_val < 0:
            lag_val = 0
        if lag_val >= len(y):
            lag_val = len(y) - 1
        r_lag = float(y[lag_val])
        first = math.sin(a) / a
        second = 0.5 + 0.5 * math.cos(a / (phir + max_depth))
        result += r_lag * first * second

    return result


def brent_maximize(f, bounds, tol: float) -> tuple[float, float]:
    """periodic.rs:103-188. Returns (x, fx)."""
    a, b = bounds
    golden = 1.0 - 0.6180339887498948482045868343656381177203091798057628621
    eps = np.finfo(np.float64).eps
    sqrt_eps = math.sqrt(eps)
    itermax = 60

    assert tol > 0 and a < b
    v = a + golden * (b - a)
    fv = f(v)
    x = v
    w = v
    fx = fv
    fw = fv

    for _ in range(1, itermax + 1):
        rng = b - a
        middle = (a + b) * 0.5
        tol_act = sqrt_eps * abs(x) + tol / 3.0

        if abs(x - middle) + rng * 0.5 <= 2.0 * tol_act:
            return x, fx

        new_step = golden * ((b - x) if x < middle else (a - x))

        if abs(x - w) >= tol_act:
            t = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * t
            q = 2.0 * q - t  # sic: periodic.rs:140 (textbook Brent uses 2(q-t))
            if q > 0.0:
                p = -p
            else:
                q = -q
            if (
                abs(p) < abs(new_step * q)
                and p > q * (a - x + 2.0 * tol_act)
                and p < q * (b - x - 2.0 * tol_act)
            ):
                new_step = p / q

        if abs(new_step) < tol_act:
            new_step = tol_act if new_step > 0 else -tol_act

        t = x + new_step
        ft = f(t)
        if ft <= fx:
            if t < x:
                b = x
            else:
                a = x
            v, w, x = w, x, t
            fv, fw, fx = fw, fx, ft
        else:
            if t < x:
                a = t
            else:
                b = t
            if ft <= fw or abs(w - x) < eps:
                v, w = w, t
                fv, fw = fw, ft
            elif ft <= fv or abs(v - x) < eps or abs(v - w) < eps:
                v = t
                fv = ft
    return x, fx


def improve_extremum_sinc(y, offset, nx, ixmid, max_depth, is_max=True):
    """periodic.rs:192-230, Sinc branch."""
    if ixmid == 0.0:
        return 0.0, float(y[0])
    if ixmid >= nx:
        return float(nx), float(y[nx - 1])

    def f(t):
        out = interpolate_sinc(y, offset, nx, t, max_depth)
        return out if is_max else -out

    return brent_maximize(f, (ixmid - 1.0, ixmid + 1.0), 1e-10)


def local_maxima(y: np.ndarray):
    """periodic.rs:362-375: 3-windows, strict, center index starts at 1."""
    out = []
    for i in range(len(y) - 2):
        if y[i] < y[i + 1] and y[i + 2] < y[i + 1]:
            out.append((i + 1, y[i + 1]))
    return out


def pitch(
    x: np.ndarray,
    sample_rate: float,
    threshold: float,
    local_peak: float,
    global_peak: float,
    fmin: float,
    fmax: float,
    refine: bool = True,
):
    """periodic.rs:396-455 (Boersma candidates). Returns [(freq, strength)],
    sorted by strength descending. local_peak/global_peak are accepted but
    unused, as in the reference (periodic.rs:357 vestigial params).
    refine=False stops after the first pass (see below)."""
    n = len(x)
    window_lag = hanning_lag(n)
    self_lag = autocorrelate(x, n)
    self_lag = normalize(self_lag)
    self_lag = self_lag / window_lag
    self_lag = np.concatenate([self_lag, np.zeros(n)])

    interpolation_depth = 0.5
    brent_ixmax = int(math.floor(interpolation_depth * n))

    maxima = []
    for (ix, _val) in local_maxima(self_lag[0:brent_ixmax]):
        peak = self_lag[ix]
        peak_rev = self_lag[ix - 1]
        peak_fwd = self_lag[ix + 1]
        dr = 0.5 * (peak_fwd - peak_rev)
        d2r = 2.0 * peak - (peak_rev - peak_fwd)
        freq = sample_rate / (ix + dr / d2r)

        offset = -brent_ixmax - 1
        nx = brent_ixmax - offset
        nval = sample_rate / freq - offset
        strn = interpolate_sinc(self_lag, offset, nx, nval, 30)
        if strn > 1.0:
            strn = 1.0 / strn
        maxima.append((freq, strn))

    maxima = [m for m in maxima if m[0] == 0.0 or (fmin < m[0] < fmax)]

    if not refine:
        # First-pass-only candidates (periodic.rs:420-439): parabolic
        # frequency + depth-30 sinc strength, no second (Brent) pass.
        # Oracle for voxtpu.pitch's refine="parabolic" turbo mode.
        maxima = list(maxima)
        maxima.append((0.0, threshold))
        maxima.sort(key=lambda p: -p[1])
        return maxima

    refined = []
    for (freq, _strn) in maxima:
        offset = -brent_ixmax - 1
        nx = brent_ixmax - offset
        nval = sample_rate / freq - offset
        xmid, ymid = improve_extremum_sinc(self_lag, offset, nx, nval, 1200, True)
        xmid += offset
        if ymid > 1.0:
            ymid = 1.0 / ymid
        refined.append((sample_rate / xmid, ymid))

    refined.append((0.0, threshold))
    refined.sort(key=lambda p: -p[1])
    return refined


# --- spectrum.rs ------------------------------------------------------------

def lpc_levinson(ac: np.ndarray, n_coeffs: int) -> np.ndarray:
    """spectrum.rs:63-84."""
    a = np.zeros(n_coeffs + 1)
    kc = np.zeros(n_coeffs)
    tmp = np.zeros(n_coeffs)
    err = ac[0]
    a[0] = 1.0
    for i in range(1, n_coeffs + 1):
        acc = ac[i]
        for j in range(1, i):
            acc += a[j] * ac[i - j]
        kc[i - 1] = -acc / err
        a[i] = kc[i - 1]
        for j in range(n_coeffs):
            tmp[j] = a[j]
        for j in range(1, i):
            a[j] = a[j] + kc[i - 1] * tmp[i - j]
        err *= 1.0 - kc[i - 1] ** 2
    return a


def lpc_burg(x: np.ndarray, p: int) -> np.ndarray:
    """spectrum.rs:101-146."""
    n = len(x)
    b1 = np.zeros(n)
    b2 = np.zeros(n)
    aa = np.zeros(p)
    coeffs = np.zeros(p)
    b1[0] = x[0]
    b2[n - 2] = x[n - 1]
    for j in range(2, n):
        b1[j - 1] = x[j - 1]
        b2[j - 2] = x[j - 1]
    for i in range(1, p + 1):
        num = 0.0
        denum = 0.0
        for j in range(1, n - i + 1):
            num += b1[j - 1] * b2[j - 1]
            denum += b1[j - 1] ** 2 + b2[j - 1] ** 2
        if denum <= 0:
            raise ArithmeticError("Denum was <= 0.0")
        coeffs[i - 1] = 2.0 * num / denum
        for j in range(1, i):
            coeffs[j - 1] = aa[j - 1] - coeffs[i - 1] * aa[i - j - 1]
        if i < p:
            for j in range(1, i + 1):
                aa[j - 1] = coeffs[j - 1]
            for j in range(1, n - i):
                b1[j - 1] = b1[j - 1] - aa[i - 1] * b2[j - 1]
                b2[j - 1] = b2[j] - aa[i - 1] * b1[j]
    return -coeffs


def resonance_from_root(root: complex, sample_rate: float):
    """spectrum.rs:166-192. Returns (freq, bw) or None."""
    freq_mul = sample_rate / (2.0 * math.pi)
    if root.imag >= 0.0:
        r = abs(root)
        theta = math.atan2(root.imag, root.real)
        if r > 1.0:
            z = 1.0 / root.conjugate()
            r = abs(z)
            theta = math.atan2(z.imag, z.real)
        freq = freq_mul * theta
        bw = -2.0 * freq_mul * math.log(r)
        safety = 50.0
        nyq = sample_rate * 0.5
        if safety < freq < nyq - safety:
            return (freq, bw)
    return None


def estimate_formants(estimates: list, resonances: list) -> None:
    """spectrum.rs:232-333. `estimates` is a list of (freq, bw), mutated in
    place. `resonances` is the full candidate list (zeros included)."""
    slots = [None] * 6

    # Step 2
    for s, est in enumerate(estimates):
        if s >= 6:
            break
        best = resonances[0]
        best_d = abs(resonances[0][0] - est[0])
        for item in resonances[1:]:
            d = abs(item[0] - est[0])
            if d < best_d:
                best, best_d = item, d
        slots[s] = best

    # Step 3
    w = 0
    has_unassigned = False
    for r in range(1, 6):
        if slots[r] is not None:
            v = slots[r]
            if v == slots[w]:
                if abs(v[0] - estimates[r][0]) < abs(v[0] - estimates[w][0]):
                    slots[w] = None
                    has_unassigned = True
                    w = r
                else:
                    slots[r] = None
                    has_unassigned = True
            else:
                w = r

    # Step 4
    if has_unassigned:
        for j in range(len(resonances)):
            peak = resonances[j]
            if peak in [s for s in slots if s is not None]:
                continue
            if j < 6 and slots[j] is None:
                slots[j] = peak
                continue
            if 0 < j < 6 and slots[j - 1] is None:
                slots[j], slots[j - 1] = slots[j - 1], slots[j]
                slots[j] = peak
                continue
            if j + 1 < 6 and slots[j + 1] is None:
                slots[j], slots[j + 1] = slots[j + 1], slots[j]
                slots[j] = peak
                continue

    # Step 5: sort None-first then by freq (stable).
    slots.sort(key=lambda s: (-math.inf if s is None else s[0]))

    winners = [s for s in slots if s is not None and s[0] > 0.0]
    for k, winner in enumerate(winners):
        if k >= len(estimates):
            break
        estimates[k] = winner


# --- polynomial.rs ----------------------------------------------------------

def laguerre(coeffs: np.ndarray, start: complex) -> complex:
    """polynomial.rs:34-72. `n` is len-1 of the (fixed) slice."""
    n = len(coeffs) - 1
    z = start
    for _ in range(20):
        abg = [coeffs[n], 0j, 0j]
        for j in range(n - 1, -1, -1):
            abg[2] = abg[2] * z + abg[1]
            abg[1] = abg[1] * z + abg[0]
            abg[0] = abg[0] * z + coeffs[j]
        if abs(abg[0]) <= 1.0e-16:
            return z
        ca = -abg[1] / abg[0]
        ca2 = ca * ca
        cb = ca2 - (2.0 * abg[2]) / abg[0]
        c1 = np.sqrt(((n - 1) * n) * cb - ca2)
        cc1 = ca + c1
        cc2 = ca - c1
        cc = n / cc1 if abs(cc1) > abs(cc2) else n / cc2
        z = z + cc
    return z


def find_roots(coeffs: np.ndarray) -> list:
    """polynomial.rs:92-152 (off_low == 0 path, as exercised by the library)."""
    c = np.asarray(coeffs, dtype=np.complex128).copy()
    deg = 0
    for i in range(len(c) - 1, -1, -1):
        if c[i] != 0:
            deg = i
            break
    assert deg >= 1, "zero degree"
    assert c[0] != 0 or deg <= 1 or True  # off_low==0 in all library uses
    m = deg
    work = c[: deg + 1].copy()
    roots = []
    while m > 2:
        z = laguerre(work, complex(-2.0, -2.0))
        roots.append(z)
        # synthetic division by (x - z): q[i] = p[i+1] + z*q[i+1]
        q = np.zeros_like(work)
        carry = 0j
        for i in range(len(work) - 2, -1, -1):
            carry = work[i + 1] + z * carry
            q[i] = carry
        work = q
        work[-1] = 0
        m -= 1
    if m == 2:
        a2 = work[2] + work[2]
        d = np.sqrt(work[1] * work[1] - 4.0 * work[2] * work[0])
        xq = -work[1]
        roots.append((xq + d) / a2)
        roots.append((xq - d) / a2)
    elif m == 1:
        roots.append(-work[0] / work[1])
    return roots


# --- lib.rs: find_formants --------------------------------------------------

MAX_RESONANCES = 32
MALE_FORMANT_ESTIMATES = [320.0, 1440.0, 2760.0, 3200.0]


def resample_linear(x: np.ndarray, ratio: float, out_len: int) -> np.ndarray:
    """sample::interpolate::Linear + Converter::scale_sample_hz (lib.rs:57-64)."""
    xp = np.concatenate([x, [0.0, 0.0]])
    out = np.empty(out_len)
    for k in range(out_len):
        p = k / ratio
        i0 = int(math.floor(p))
        frac = p - i0
        out[k] = xp[i0] + (xp[i0 + 1] - xp[i0]) * frac
    return out


def find_formants_frame(
    buf: np.ndarray,
    sample_rate: float,
    resample_ratio: float,
    n_coeffs: int,
    formants: list,
) -> None:
    """lib.rs:40-116 for one frame; `formants` [(f, bw)] mutated in place."""
    if resample_ratio != 1.0:
        out_len = int(math.ceil(resample_ratio * len(buf)))
        buf = resample_linear(buf, resample_ratio, out_len)
    else:
        buf = buf.copy()

    n = len(buf)
    buf = buf * hanning(n)

    coeffs = lpc_burg(buf, n_coeffs)

    # [1, a1..an] reversed -> poly coeffs by power (lib.rs:76-91)
    poly = np.zeros(n_coeffs + 1, dtype=np.complex128)
    rev = list([1.0] + list(coeffs))[::-1]
    for k, v in enumerate(rev):
        poly[k] = v

    roots = find_roots(poly)

    resonances = [(0.0, 0.0)] * MAX_RESONANCES
    count = 0
    for root in roots:
        if root.imag > 0.0:
            res = resonance_from_root(root, sample_rate)
            if res is not None:
                resonances[count] = res
                count += 1
    rpos = 0
    for i in range(MAX_RESONANCES - 1, -1, -1):
        if resonances[i][0] != 0.0:
            rpos = i
            break
    prefix = sorted(resonances[: rpos + 1], key=lambda r: r[0])
    resonances = prefix + resonances[rpos + 1 :]

    estimate_formants(formants, resonances)


# --- spectrum.rs: MFCC --------------------------------------------------------

def hz_to_mel(hz: float) -> float:
    return 1125.0 * math.log1p(hz / 700.0)


def mel_to_hz(mel: float) -> float:
    return 700.0 * (math.exp(mel / 1125.0) - 1.0)


def dct(signal: np.ndarray) -> np.ndarray:
    """spectrum.rs:391-398."""
    n = len(signal)
    out = np.zeros(n)
    for k in range(n):
        acc = 0.0
        for m in range(n):
            acc += signal[m] * math.cos(math.pi * k * (2.0 * m + 1.0) / (2.0 * n))
        out[k] = 2.0 * acc
    return out


def mfcc(x: np.ndarray, num_coeffs: int, freq_bounds: tuple, sample_rate: float) -> np.ndarray:
    """spectrum.rs:410-440, verbatim (norm_sqr/norm slope quirk, log clamp)."""
    n = len(x)
    mel_range = hz_to_mel(freq_bounds[1]) - hz_to_mel(freq_bounds[0])
    points = [(i / num_coeffs) * mel_range + hz_to_mel(freq_bounds[0]) for i in range(num_coeffs + 2)]
    bins = [int(math.floor((n + 1) * mel_to_hz(p) / sample_rate)) for p in points]

    spectrum = np.fft.fft(x)  # full complex FFT (rustfft, forward)

    energies = []
    for w in range(len(bins) - 2):
        b0, b1, b2 = bins[w], bins[w + 1], bins[w + 2]
        up = b1 - b0
        up_sum = 0.0
        for i, b in enumerate(range(b0, b1)):
            up_sum += abs(abs(spectrum[b]) ** 2) * (i / up)
        down = b2 - b1
        down_sum = 0.0
        for i, b in enumerate(range(b1, b2)):
            down_sum += abs(abs(spectrum[b])) * (i / down)
        e = math.log10(up_sum + down_sum) if (up_sum + down_sum) > 0 else -math.inf
        energies.append(max(e, 1.0e-10))
    return dct(np.asarray(energies))


# --- Boersma 1993 §4: pitch path finder ---------------------------------------
# The reference STUBS this (periodic.rs:320-354 returns candidates[frame][0]);
# voxtpu implements the real path search (voxtpu/viterbi.py). This oracle is an
# independent scalar transcription of the PAPER's cost definitions — Boersma
# (1993), "Accurate short-term analysis of the fundamental frequency ...",
# IFA Proceedings 17 — so the JAX implementation is pinned to the publication,
# not to itself (VERDICT r2 #5):
#
#   eq. 23 (unvoiced candidate local strength, silence-aware):
#       R = VoicingThreshold
#           + max(0, 2 - (localPeak/globalPeak) /
#                        (SilenceThreshold / (1 + VoicingThreshold)))
#   eq. 24 (voiced candidate local strength, high-frequency preference):
#       R = r - OctaveCost * log2(PitchCeiling / F)
#   §4 transition costs between consecutive frames:
#       unvoiced -> unvoiced : 0
#       voiced  <-> unvoiced : VoicedUnvoicedCost
#       voiced   -> voiced   : OctaveJumpCost * |log2(F1 / F2)|
#
# The path maximizes sum(local strengths) - sum(transition costs). Standard
# values from the paper: SilenceThreshold 0.03, VoicingThreshold 0.45,
# OctaveCost 0.01, OctaveJumpCost 0.35, VoicedUnvoicedCost 0.14.


def boersma_local_strength(
    freq: float,
    strength: float,
    intensity: float | None,
    silence_threshold: float = 0.03,
    voicing_threshold: float = 0.45,
    octave_cost: float = 0.01,
    ceiling: float = 600.0,
) -> float:
    """Per-candidate local strength: eq. 24 (voiced) / eq. 23 (unvoiced).
    `intensity` is localPeak/globalPeak; None falls back to the raw strength
    (no silence information — matches voxtpu's local_intensity=None mode)."""
    if freq > 0.0:
        return strength - octave_cost * math.log2(ceiling / freq)
    if intensity is None:
        return strength
    return voicing_threshold + max(
        0.0, 2.0 - intensity / (silence_threshold / (1.0 + voicing_threshold))
    )


def boersma_transition_cost(
    f_prev: float,
    f_cur: float,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
) -> float:
    vp, vc = f_prev > 0.0, f_cur > 0.0
    if vp and vc:
        return octave_jump_cost * abs(math.log2(f_prev / f_cur))
    if vp != vc:
        return voiced_unvoiced_cost
    return 0.0


def boersma_pitch_path(
    freq: np.ndarray,
    strength: np.ndarray,
    valid: np.ndarray,
    intensity: np.ndarray | None = None,
    silence_threshold: float = 0.03,
    voicing_threshold: float = 0.45,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
    ceiling: float = 600.0,
) -> list:
    """Scalar Viterbi over (F, C) candidates: returns the frame-wise candidate
    indices of the maximum-score path. Plain nested loops + backtracking —
    deliberately nothing like the lax.scan formulation under test. Ties break
    toward the lowest candidate index (first maximum)."""
    F, C = freq.shape
    NEG = -math.inf

    def local(t, c):
        if not valid[t, c]:
            return NEG
        inten = None if intensity is None else float(intensity[t])
        return boersma_local_strength(
            float(freq[t, c]), float(strength[t, c]), inten,
            silence_threshold, voicing_threshold, octave_cost, ceiling,
        )

    score = [[NEG] * C for _ in range(F)]
    back = [[0] * C for _ in range(F)]
    for c in range(C):
        score[0][c] = local(0, c)
    for t in range(1, F):
        for c in range(C):
            loc = local(t, c)
            best_prev, best_val = 0, NEG
            for p in range(C):
                v = score[t - 1][p] - boersma_transition_cost(
                    float(freq[t - 1, p]), float(freq[t, c]),
                    octave_jump_cost, voiced_unvoiced_cost,
                )
                if v > best_val:
                    best_prev, best_val = p, v
            score[t][c] = loc + best_val
            back[t][c] = best_prev
    last, last_val = 0, NEG
    for c in range(C):
        if score[F - 1][c] > last_val:
            last, last_val = c, score[F - 1][c]
    path = [0] * F
    path[F - 1] = last
    for t in range(F - 1, 0, -1):
        path[t - 1] = back[t][path[t]]
    return path
