"""Formant extraction example, mirroring the reference's
examples/formant_extraction binary: resample the bundled two-vowels recording
toward 10 kHz analysis, 50 ms frames / 10 ms hops, order-13 Burg LPC, tracked
formants + RMS + pitch printed as gnuplot columns (see
scripts/plot_formants.gnuplot).

Run: python examples/formant_extraction.py > output.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxtpu.cli import main as cli_main


def main():
    wav = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "sample-two_vowels.wav",
    )
    return cli_main([
        "analyze", wav,
        "--resample-hz", "10000",
        "--frame-ms", "50", "--hop-ms", "10",
        "--n-coeffs", "13",
        "--fmin", "50", "--fmax", "200",
    ])


if __name__ == "__main__":
    raise SystemExit(main())
