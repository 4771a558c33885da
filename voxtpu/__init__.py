"""voxtpu — TPU-native speech analysis (pitch, formants, MFCC).

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
`andrewcsmith/vox_box.rs` (reference mounted at /root/reference): wave
utilities, framewise autocorrelation, Boersma pitch detection, Levinson-Durbin
and Burg LPC, Laguerre root finding, McCandless formant tracking, and MFCC —
all as batched, fused kernels over framed audio, sharded across TPU meshes for
corpus-scale jobs. See PARITY.md for the component-by-component map.
"""

from voxtpu import errors
from voxtpu.waves import rms, amplitude, max_amplitude, normalize, preemphasis
from voxtpu.windows import hann, hanning_lag
from voxtpu.autocorr import autocorrelate
from voxtpu.lpc import levinson, burg
from voxtpu.cplx import C, csqrt
from voxtpu.roots import degree, off_low, laguerre, find_roots, polish_roots
from voxtpu.resonance import resonances_from_roots, sort_and_pack_resonances
from voxtpu.formants import (
    MAX_RESONANCES,
    MALE_FORMANT_ESTIMATES,
    FEMALE_FORMANT_ESTIMATES,
    estimate_formants_step,
    formant_tracker,
    find_formants,
    resample_linear,
)
from voxtpu.sinc import interpolate_sinc, brent_maximize_sinc, improve_extremum_sinc
from voxtpu.pitch import pitch_frames, best_pitch
from voxtpu.viterbi import PathConfig, pitch_path, pitch_track
from voxtpu.mfcc import hz_to_mel, mel_to_hz, dct, mfcc
from voxtpu.frame import frame_signal, num_frames
from voxtpu.io_wav import read_wav
from voxtpu.pipeline import (
    AnalysisConfig,
    PitchConfig,
    FormantConfig,
    MfccConfig,
    analyze,
    analyze_batch,
    analyze_frames,
    analyze_long,
    analyze_stream,
    finalize_viterbi,
    StreamAnalyzer,
)

__version__ = "0.1.0"

__all__ = [
    # errors (C1)
    "errors",
    # waves (C3-C6)
    "rms",
    "amplitude",
    "max_amplitude",
    "normalize",
    "preemphasis",
    # windows (C8)
    "hann",
    "hanning_lag",
    # periodic (C7, C9-C13)
    "autocorrelate",
    "interpolate_sinc",
    "brent_maximize_sinc",
    "improve_extremum_sinc",
    "pitch_frames",
    "best_pitch",
    # viterbi (C14)
    "PathConfig",
    "pitch_path",
    "pitch_track",
    # spectrum (C15-C21)
    "levinson",
    "burg",
    "resonances_from_roots",
    "sort_and_pack_resonances",
    "estimate_formants_step",
    "formant_tracker",
    "hz_to_mel",
    "mel_to_hz",
    "dct",
    "mfcc",
    # polynomial/complex (C2, C22-C25)
    "C",
    "csqrt",
    "degree",
    "off_low",
    "laguerre",
    "find_roots",
    "polish_roots",
    # lib.rs pipeline (C26)
    "MAX_RESONANCES",
    "MALE_FORMANT_ESTIMATES",
    "FEMALE_FORMANT_ESTIMATES",
    "find_formants",
    "resample_linear",
    # drivers (C27)
    "frame_signal",
    "num_frames",
    "read_wav",
    "AnalysisConfig",
    "PitchConfig",
    "FormantConfig",
    "MfccConfig",
    "analyze",
    "analyze_batch",
    "analyze_frames",
    "analyze_long",
    "analyze_stream",
    "StreamAnalyzer",
    "finalize_viterbi",
]
