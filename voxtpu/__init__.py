"""voxtpu — TPU-native speech analysis (pitch, formants, MFCC).

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
`andrewcsmith/vox_box.rs` (reference mounted at /root/reference): wave
utilities, framewise autocorrelation, Boersma pitch detection, Levinson-Durbin
and Burg LPC, Laguerre root finding, McCandless formant tracking, and MFCC —
all as batched, fused kernels over framed audio, sharded across TPU meshes for
corpus-scale jobs.
"""

from voxtpu import errors
from voxtpu.waves import rms, amplitude, max_amplitude, normalize, preemphasis
from voxtpu.windows import hann, hanning_lag
from voxtpu.autocorr import autocorrelate

# Constants mirroring /root/reference/src/lib.rs:26-28.
MAX_RESONANCES = 32
MALE_FORMANT_ESTIMATES = (320.0, 1440.0, 2760.0, 3200.0)
FEMALE_FORMANT_ESTIMATES = (480.0, 1760.0, 3200.0, 3520.0)

__version__ = "0.1.0"

__all__ = [
    "errors",
    "rms",
    "amplitude",
    "max_amplitude",
    "normalize",
    "preemphasis",
    "hann",
    "hanning_lag",
    "autocorrelate",
    "MAX_RESONANCES",
    "MALE_FORMANT_ESTIMATES",
    "FEMALE_FORMANT_ESTIMATES",
]
