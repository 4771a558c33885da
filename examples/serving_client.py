"""Serving example: start the voxtpu daemon in-process and drive it like a
client — the deployment shape the reference leaves to the caller's serial
loop (/root/reference/tests/lib.rs:71-83).

In production you'd run the daemon standalone

    python -m voxtpu serve --port 8080 [--data-parallel N]

and POST WAV bytes from anywhere:

    curl -s --data-binary @speech.wav \
        'localhost:8080/analyze?viterbi=1&format=json' | jq .features.f0

Run: python examples/serving_client.py
"""

import http.client
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from voxtpu.serve import ServeConfig, VoxServer

    srv = VoxServer(ServeConfig(port=0, window_ms=2.0, max_batch=4, bucket=64))
    host, port = srv.start()
    wav = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "short_sample.wav",
    )
    with open(wav, "rb") as f:
        body = f.read()

    conn = http.client.HTTPConnection(host, port, timeout=900)
    conn.request("POST", "/analyze?fmax=500", body=body)
    resp = json.loads(conn.getresponse().read())
    conn.close()

    f0 = resp["features"]["f0"]
    print(f"{resp['frames']} frames @ {resp['sample_rate']:.0f} Hz "
          f"(frame {resp['frame_len']}, hop {resp['hop']})")
    print("f0 track:", " ".join(f"{v:.1f}" for v in f0))

    # Streaming: recordings longer than any whole-body upload ride the
    # /stream session API — raw PCM appends, features back per completed
    # chunk, bounded server memory, whole-stream Viterbi at close.
    from voxtpu.io_wav import read_wav
    import numpy as np

    data = read_wav(wav, dtype=np.float32)
    pcm = np.ascontiguousarray(data.samples, dtype=np.float32).tobytes()

    def post(path, body=b""):
        c = http.client.HTTPConnection(host, port, timeout=900)
        c.request("POST", path, body=body)
        r = json.loads(c.getresponse().read())
        c.close()
        return r

    sess = post(f"/stream/open?rate={data.sample_rate}&viterbi=1&chunk_frames=8")
    sid = sess["session"]
    n_chunks = 0
    for i in range(0, len(pcm), 16384):
        r = post(f"/stream/append?session={sid}", pcm[i:i + 16384])
        n_chunks += int(r["frames"] > 0)
    final = post(f"/stream/close?session={sid}")
    vf0 = final["viterbi"]["f0"]
    print(f"streamed {final['frames_done']} frames in "
          f"{n_chunks + 1} chunk responses; viterbi f0 track: "
          + " ".join(f"{v:.1f}" for v in vf0[:8]) + " ...")

    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    conn.close()
    print(f"server stats: {stats['requests']} request(s), "
          f"batches {stats['batch_size_hist']}, shapes {stats['compiled_shapes']}, "
          f"stream chunks {stats['stream_chunks']}")
    srv.shutdown()


if __name__ == "__main__":
    main()
