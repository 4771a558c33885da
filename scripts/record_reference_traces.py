"""Record oracle (reference-semantics) traces for the bundled WAVs.

Produces tests/fixtures/reference_traces.npz with per-frame pitch candidates,
formant tracks, and MFCCs computed by the scalar transcription of the Rust
reference (tests/reference_impl.py). The parity tests then assert the batched
implementation frame-for-frame against these recorded values — pinning both
against the oracle *and* against accidental oracle edits.

Run on CPU: `python scripts/record_reference_traces.py` (slow; minutes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import cpu_env  # noqa: F401,E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import reference_impl as ref  # noqa: E402
from voxtpu.io_wav import read_wav  # noqa: E402

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def main():
    out = {}

    # --- short_sample.wav: formants (bin 1024 hop 512 order 10, lib.rs:44-90)
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    sr = float(wav.sample_rate)
    samples = wav.samples
    bin_, hop, order = 1024, 512, 10
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    F = (len(samples) - bin_) // hop + 1
    ff, fb = [], []
    for i in range(F):
        frame = samples[i * hop : i * hop + bin_].copy()
        ref.find_formants_frame(frame, sr, 1.0, order, formants)
        ff.append([f for f, _ in formants])
        fb.append([b for _, b in formants])
    out["short_formant_freqs"] = np.asarray(ff)
    out["short_formant_bws"] = np.asarray(fb)

    # --- short_sample.wav: pitch candidates (bin 512 hop 256, hann)
    bin_, hop = 512, 256
    F = (len(samples) - bin_) // hop + 1
    w = ref.hanning(bin_)
    cand_f = np.zeros((F, 33))
    cand_s = np.zeros((F, 33))
    cand_n = np.zeros(F, dtype=np.int32)
    for i in range(F):
        frame = samples[i * hop : i * hop + bin_] * w
        cands = ref.pitch(frame, sr, 0.2, 1.0, 1.0, 60.0, 500.0)
        cand_n[i] = len(cands)
        for j, (f, s) in enumerate(cands[:33]):
            cand_f[i, j], cand_s[i, j] = f, s
        print(f"pitch frame {i+1}/{F}", flush=True)
    out["short_pitch_freq"] = cand_f
    out["short_pitch_strength"] = cand_s
    out["short_pitch_count"] = cand_n

    # --- short_sample.wav: MFCC (bin 512 hop 256, hann, 13 coeffs)
    mf = []
    for i in range(F):
        frame = samples[i * hop : i * hop + bin_] * w
        mf.append(ref.mfcc(frame, 13, (100.0, 5000.0), sr))
    out["short_mfcc"] = np.asarray(mf)

    # --- synth_16k.wav: 16 kHz trace set (VERDICT r1 #6 — a second sample
    # rate catches rate-dependent regressions in lag windows / mel edges).
    wav16 = read_wav(os.path.join(FIX, "synth_16k.wav"))
    sr16 = float(wav16.sample_rate)
    s16 = wav16.samples

    # formants: 64 ms bins / 32 ms hops, order 12
    bin_, hop, order = 1024, 512, 12
    F = (len(s16) - bin_) // hop + 1
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    ff, fb = [], []
    for i in range(F):
        frame = s16[i * hop : i * hop + bin_].copy()
        ref.find_formants_frame(frame, sr16, 1.0, order, formants)
        ff.append([f for f, _ in formants])
        fb.append([b for _, b in formants])
    out["synth16k_formant_freqs"] = np.asarray(ff)
    out["synth16k_formant_bws"] = np.asarray(fb)

    # pitch candidates: 32 ms bins / 16 ms hops, hann
    bin_, hop = 512, 256
    F = (len(s16) - bin_) // hop + 1
    w = ref.hanning(bin_)
    cand_f = np.zeros((F, 33))
    cand_s = np.zeros((F, 33))
    cand_n = np.zeros(F, dtype=np.int32)
    for i in range(F):
        frame = s16[i * hop : i * hop + bin_] * w
        cands = ref.pitch(frame, sr16, 0.2, 1.0, 1.0, 60.0, 500.0)
        cand_n[i] = len(cands)
        for j, (f, s) in enumerate(cands[:33]):
            cand_f[i, j], cand_s[i, j] = f, s
        print(f"16k pitch frame {i+1}/{F}", flush=True)
    out["synth16k_pitch_freq"] = cand_f
    out["synth16k_pitch_strength"] = cand_s
    out["synth16k_pitch_count"] = cand_n

    # MFCC: same framing, 13 coeffs, 100-6000 Hz
    mf = []
    for i in range(F):
        frame = s16[i * hop : i * hop + bin_] * w
        mf.append(ref.mfcc(frame, 13, (100.0, 6000.0), sr16))
    out["synth16k_mfcc"] = np.asarray(mf)

    # --- synth_8k.wav / synth_48k.wav: more rates (make_synth_fixture.py) —
    # telephony-band 8 kHz (formants near Nyquist) and pro-audio 48 kHz.
    for tag, fname, fbin, fhop, order, pbin, phop, fmax, mel_hi in (
        ("synth8k", "synth_8k.wav", 512, 256, 10, 512, 256, 450.0, 3500.0),
        ("synth48k", "synth_48k.wav", 2048, 1024, 12, 1024, 512, 500.0, 8000.0),
    ):
        wavr = read_wav(os.path.join(FIX, fname))
        srr = float(wavr.sample_rate)
        sx = wavr.samples

        formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
        F = (len(sx) - fbin) // fhop + 1
        ff, fb = [], []
        for i in range(F):
            frame = sx[i * fhop : i * fhop + fbin].copy()
            ref.find_formants_frame(frame, srr, 1.0, order, formants)
            ff.append([f for f, _ in formants])
            fb.append([b for _, b in formants])
        out[f"{tag}_formant_freqs"] = np.asarray(ff)
        out[f"{tag}_formant_bws"] = np.asarray(fb)

        # Capacity 48: the noisy 8 kHz vowel frames exceed the default 33
        # candidate slots (34 observed) — PARITY deviation 1 territory; the
        # tests run pitch_frames with a matching max_candidates.
        F = (len(sx) - pbin) // phop + 1
        w = ref.hanning(pbin)
        cand_f = np.zeros((F, 48))
        cand_s = np.zeros((F, 48))
        cand_n = np.zeros(F, dtype=np.int32)
        mf = []
        for i in range(F):
            frame = sx[i * phop : i * phop + pbin] * w
            cands = ref.pitch(frame, srr, 0.2, 1.0, 1.0, 60.0, fmax)
            cand_n[i] = len(cands)
            for j, (f, s) in enumerate(cands[:48]):
                cand_f[i, j], cand_s[i, j] = f, s
            mf.append(ref.mfcc(frame, 13, (100.0, mel_hi), srr))
            print(f"{tag} pitch frame {i+1}/{F}", flush=True)
        out[f"{tag}_pitch_freq"] = cand_f
        out[f"{tag}_pitch_strength"] = cand_s
        out[f"{tag}_pitch_count"] = cand_n
        out[f"{tag}_mfcc"] = np.asarray(mf)

    # --- down_sampled.wav: whole-file formants (order 13, lib.rs:13-42)
    wav2 = read_wav(os.path.join(FIX, "down_sampled.wav"))
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    ref.find_formants_frame(wav2.samples.copy(), float(wav2.sample_rate), 1.0, 13, formants)
    out["down_formants"] = np.asarray(formants)

    path = os.path.join(FIX, "reference_traces.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
