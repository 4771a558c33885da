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

    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    conn.close()
    print(f"server stats: {stats['requests']} request(s), "
          f"batches {stats['batch_size_hist']}, shapes {stats['compiled_shapes']}")
    srv.shutdown()


if __name__ == "__main__":
    main()
