// Golden-capture harness for the reference crate (vox_box.rs).
//
// Injected into a scratch copy of /root/reference as examples/capture_goldens.rs
// by scripts/capture_rust_goldens.sh; never compiled in this repo. Emits one
// JSON object per line to stdout:
//
//   {"kind":"formants","file":F,"frame":I,"slots":[[freq,bw],...]}
//   {"kind":"pitch","file":F,"frame":I,"cands":[[freq,strength],...]}
//   {"kind":"mfcc","file":F,"frame":I,"coeffs":[...]}
//
// Configs mirror the reference's own drivers so the outputs line up with the
// transcription oracle (tests/reference_impl.py) frame-for-frame:
//   formants: rectangle 1024/512, Burg order 10, male estimates
//             (tests/lib.rs:44-90)
//   pitch:    hann 2048/1024, threshold 0.2, band (60, 500)
//             (examples/pitch_detection.rs:15-49 shapes on real audio)
//   mfcc:     hann 512/256, 13 coeffs, band (100, 4000) @ 11.025 kHz
//             (spectrum.rs:580-590 driver pattern)
//
// f64 values are printed with Rust's round-trip-shortest `{}` formatting;
// non-finite values print as null.

extern crate hound;
extern crate num;
extern crate sample;
extern crate vox_box;

use hound::WavReader;
use num::Complex;
use sample::window::{Window, Windower, Hanning};
use sample::ToSampleSlice;
use vox_box::periodic::Pitched;
use vox_box::spectrum::{Resonance, MFCC};
use std::i32;

fn read_wav(path: &str) -> (Vec<f64>, f64) {
    let mut reader = WavReader::open(path).unwrap();
    let bits = reader.spec().bits_per_sample;
    let sr = reader.spec().sample_rate as f64;
    let samples: Vec<f64> = reader
        .samples::<i32>()
        .map(|s| s.unwrap() as f64 / (i32::MAX >> (32 - bits)) as f64)
        .collect();
    (samples, sr)
}

fn jnum(x: f64) -> String {
    if x.is_finite() {
        format!("{}", x)
    } else {
        "null".to_string()
    }
}

fn jpairs(v: &[(f64, f64)]) -> String {
    let items: Vec<String> = v
        .iter()
        .map(|&(a, b)| format!("[{},{}]", jnum(a), jnum(b)))
        .collect();
    format!("[{}]", items.join(","))
}

fn jvec(v: &[f64]) -> String {
    let items: Vec<String> = v.iter().map(|&x| jnum(x)).collect();
    format!("[{}]", items.join(","))
}

fn hann_table(n: usize) -> Vec<f64> {
    Window::<[f64; 1], Hanning>::new(n)
        .take(n)
        .map(|x| x.to_sample_slice()[0])
        .collect()
}

fn rect_frames(samples: &[f64], bin: usize, hop: usize) -> Vec<Vec<f64>> {
    let sample_frames: &[[f64; 1]] = sample::slice::to_frame_slice(samples).unwrap();
    let mut out = Vec::new();
    for frame in Windower::rectangle(sample_frames, bin, hop) {
        let mut buf: Vec<f64> = Vec::with_capacity(bin);
        for s in frame.take(bin) {
            buf.push(s[0]);
        }
        out.push(buf);
    }
    out
}

fn capture_formants(name: &str, samples: &[f64], sr: f64, bin: usize, hop: usize, n_coeffs: usize) {
    let mut formants: Vec<Resonance<f64>> = vox_box::MALE_FORMANT_ESTIMATES
        .iter()
        .map(|f| Resonance::new(*f, 1.0))
        .collect();
    let mut work = vec![0f64; vox_box::find_formants_real_work_size(bin, n_coeffs)];
    let mut complex_work =
        vec![Complex::new(0f64, 0.); vox_box::find_formants_complex_work_size(n_coeffs)];
    let mut resampled_buf = vec![0f64; bin];

    for (i, frame) in rect_frames(samples, bin, hop).iter().enumerate() {
        let mut buf = frame.clone();
        vox_box::find_formants(
            &mut buf[..],
            sr,
            1.0,
            &mut resampled_buf[..buf.len()],
            n_coeffs,
            &mut work[..],
            &mut complex_work[..],
            &mut formants[..],
        )
        .unwrap();
        let slots: Vec<(f64, f64)> = formants.iter().map(|r| (r.frequency, r.bandwidth)).collect();
        println!(
            "{{\"kind\":\"formants\",\"file\":\"{}\",\"frame\":{},\"slots\":{}}}",
            name,
            i,
            jpairs(&slots)
        );
    }
}

fn capture_pitch(name: &str, samples: &[f64], sr: f64, bin: usize, hop: usize) {
    let w = hann_table(bin);
    for (i, frame) in rect_frames(samples, bin, hop).iter().enumerate() {
        if frame.len() < bin {
            continue; // pitch needs the full window; partial tail frames skipped
        }
        let windowed: Vec<f64> = frame.iter().zip(w.iter()).map(|(x, h)| x * h).collect();
        let cands = windowed.pitch::<Hanning>(sr, 0.2, 1.0, 1.0, 60.0, 500.0);
        let pairs: Vec<(f64, f64)> = cands.iter().map(|p| (p.frequency, p.strength)).collect();
        println!(
            "{{\"kind\":\"pitch\",\"file\":\"{}\",\"frame\":{},\"cands\":{}}}",
            name,
            i,
            jpairs(&pairs)
        );
    }
}

fn capture_mfcc(name: &str, samples: &[f64], sr: f64, bin: usize, hop: usize) {
    let w = hann_table(bin);
    for (i, frame) in rect_frames(samples, bin, hop).iter().enumerate() {
        if frame.len() < bin {
            continue;
        }
        let windowed: Vec<f64> = frame.iter().zip(w.iter()).map(|(x, h)| x * h).collect();
        let coeffs: Vec<f64> = windowed.mfcc(13, (100.0, 4000.0), sr);
        println!(
            "{{\"kind\":\"mfcc\",\"file\":\"{}\",\"frame\":{},\"coeffs\":{}}}",
            name,
            i,
            jvec(&coeffs)
        );
    }
}

fn main() {
    for name in &["short_sample.wav", "down_sampled.wav"] {
        let (samples, sr) = read_wav(&format!("tests/{}", name));
        capture_formants(name, &samples, sr, 1024, 512, 10);
        capture_pitch(name, &samples, sr, 2048, 1024);
        capture_mfcc(name, &samples, sr, 512, 256);
    }
}
