#!/usr/bin/env python
"""TTS serving daemon: HTTP front end over the dynamic-batching engine.

    python serve.py -m <am_checkpoint> [--port 8080 --batch-size 8 \
        --window-ms 15 --static-frames 512 --int8]

Endpoints
---------
POST /synthesize   body {"text": "3_1_0 5_2_0 ..."} (id_tone[_er] phone
                   tokens, synthesize.py contract). Returns audio/wav; with
                   "format": "json" returns {"wav_b64", "sample_rate",
                   "duration_s", "latency_s"}; with "stream": true returns
                   a chunked-transfer streaming WAV (unknown-length RIFF
                   header, then int16 PCM pieces as the vocoder emits them
                   — time-to-first-audio is one decode chunk, not the whole
                   utterance).
GET  /healthz      {"status": "ok"} once warmup finished.
GET  /stats        engine counters: batching, latency percentiles,
                   device realtime factor.

The engine pins one device batch size, a text-bucket ladder, and a
per-utterance frame cap (--max-frames, dynamic mode) and pre-compiles
every reachable graph at startup — streaming decode graphs included by
default whenever the decoder can stream — so no request ever waits on
XLA (msmctts_tpu/serving.py). Warmup populates the persistent compile
cache: run once with --warmup-only at deploy time and every later start
reaches /healthz in seconds. For latency-bound deploys shrink the graph
product with --max-frames (fewer reachable frame buckets) and
--warmup-lengths (fewer text buckets), or pin one shape with
--static-frames. The reference has no serving surface; this wraps
the same task path its infer.py drives (/root/reference/infer.py:45-91).
"""

import argparse
import base64
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_engine(args):
    from msmctts_tpu.config import Config
    from msmctts_tpu.serving import BatchingEngine
    from msmctts_tpu.tasks import build_task
    from msmctts_tpu.utils.checkpoint import load_checkpoint

    if args.artifact:
        # Deployment mode: serve straight from exported StableHLO modules
        # (tools/export_tts.py) — no model code, config, or checkpoint.
        from msmctts_tpu.export import ExportedTTS

        art = ExportedTTS(args.artifact)
        return BatchingEngine(
            art,
            sample_rate=args.sample_rate or art.sample_rate,
            batch_size=art.batch_size,
            window_ms=args.window_ms,
            text_buckets=art.buckets,
            max_queue=args.max_queue,
        )

    ckpt = load_checkpoint(args.model)
    config = Config(args.config) if args.config else Config(ckpt["config"])
    task = build_task(config, mode="infer")
    task.load_variables(ckpt["state"])
    if args.static_frames:
        task.static_max_frames = args.static_frames
    if args.int8:
        task.int8_decoder = True
    mesh = None
    if args.mesh_devices != 1:
        from msmctts_tpu.parallel.mesh import make_mesh

        n = None if args.mesh_devices in (0, -1) else args.mesh_devices
        mesh = make_mesh(n)
    sr = args.sample_rate or int(config.dataset["samplerate"])
    return BatchingEngine(
        task,
        sample_rate=sr,
        batch_size=args.batch_size,
        window_ms=args.window_ms,
        max_frames=args.max_frames,
        max_queue=args.max_queue,
        stream_chunk_frames=args.stream_chunk_frames,
        mesh=mesh,
    )


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    pcm = np.clip(wav, -1.0, 1.0)
    wavfile.write(buf, sr, (pcm * 32767.0).astype(np.int16))
    return buf.getvalue()


def pcm16(wav: np.ndarray) -> bytes:
    return (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def streaming_wav_header(sr: int) -> bytes:
    """RIFF/WAVE header with unknown (0xFFFFFFFF) sizes — the standard
    convention for live PCM streams (players read until the socket
    closes)."""
    import struct

    return b"".join([
        b"RIFF", struct.pack("<I", 0xFFFFFFFF), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16),
        b"data", struct.pack("<I", 0xFFFFFFFF),
    ])


def make_handler(engine, ready: threading.Event, request_timeout: float):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # quiet per-request noise
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            try:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                # client hung up mid-response (e.g. a health poller with a
                # short timeout during warmup) — not a server error; keep
                # ThreadingHTTPServer from dumping a traceback per poll
                self.close_connection = True

        def _json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _chunk(self, data: bytes):
            """One HTTP/1.1 chunked-transfer frame (b'' terminates)."""
            self.wfile.write(f"{len(data):x}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")

        def _stream_response(self, text: str):
            """Chunked streaming WAV: errors before the first audio chunk
            still get a proper JSON status; after headers are sent a
            failure can only close the connection."""
            gen = engine.synthesize_stream(text, timeout=request_timeout)
            try:
                first = next(gen, None)
            except TimeoutError:
                self._json(504, {"error": "synthesis timed out"})
                return
            except RuntimeError as e:
                code = 503 if "overloaded" in str(e) else 500
                self._json(code, {"error": str(e)})
                return
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                self._chunk(streaming_wav_header(engine.sample_rate))
                if first is not None:
                    self._chunk(pcm16(first))
                    for piece in gen:
                        self._chunk(pcm16(piece))
                self._chunk(b"")  # terminator
            except (BrokenPipeError, ConnectionResetError):
                for _ in gen:  # client left; drain so the worker isn't blocked
                    pass

        def do_GET(self):
            if self.path == "/healthz":
                if ready.is_set():
                    self._json(200, {"status": "ok"})
                else:
                    self._json(503, {"status": "warming_up"})
            elif self.path == "/stats":
                self._json(200, engine.stats.snapshot(engine.sample_rate))
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/reload":
                # zero-downtime weight swap: {"model": <checkpoint path>}
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    path = req["model"]
                except (ValueError, KeyError) as e:
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                from msmctts_tpu.utils.checkpoint import load_checkpoint

                try:
                    t0 = time.time()
                    engine.reload(load_checkpoint(path)["state"])
                except (OSError, KeyError, RuntimeError) as e:
                    self._json(400, {"error": f"cannot load {path}: {e}"})
                    return
                self._json(
                    200, {"status": "reloaded", "model": path,
                          "swap_s": round(time.time() - t0, 3)}
                )
                return
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            if not ready.is_set():
                # warmup owns the device until every graph is compiled
                self._json(503, {"error": "warming_up"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
            except (ValueError, KeyError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            if req.get("stream"):
                self._stream_response(text)
                return
            t0 = time.time()
            try:
                wav = engine.synthesize(text, timeout=request_timeout)
            except TimeoutError:
                self._json(504, {"error": "synthesis timed out"})
                return
            except RuntimeError as e:
                code = 503 if "overloaded" in str(e) else 500
                self._json(code, {"error": str(e)})
                return
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            latency = time.time() - t0
            if req.get("format") == "json":
                self._json(
                    200,
                    {
                        "wav_b64": base64.b64encode(
                            wav_bytes(wav, engine.sample_rate)
                        ).decode(),
                        "sample_rate": engine.sample_rate,
                        "duration_s": round(wav.shape[0] / engine.sample_rate, 4),
                        "latency_s": round(latency, 4),
                    },
                )
            else:
                self._send(200, wav_bytes(wav, engine.sample_rate), "audio/wav")

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default=None, help="AM checkpoint")
    p.add_argument("--artifact", default=None, metavar="DIR",
                   help="serve from an exported StableHLO artifact dir "
                        "(tools/export_tts.py) instead of a checkpoint; "
                        "batch size and text buckets come from its manifest")
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--window-ms", type=float, default=15.0)
    p.add_argument("--static-frames", type=int, default=None,
                   help="single-round-trip latency mode (fixed frame bucket)")
    p.add_argument("--max-frames", type=int, default=1024,
                   help="serving cap on total frames per utterance "
                        "(dynamic mode; bounds warmup to the reachable "
                        "text x frame bucket product; 1024 = 12.8 s "
                        "at 24 kHz/300)")
    p.add_argument("--warmup-streaming", action="store_true",
                   help="force streaming-decode warmup (error if the "
                        "decoder cannot stream); default is auto — "
                        "streaming graphs are warmed whenever the task "
                        "supports streaming")
    p.add_argument("--no-warmup-streaming", action="store_true",
                   help="skip streaming-decode warmup (halves warmup "
                        "time); cold streaming requests are then refused "
                        "up front instead of compiling in the worker")
    p.add_argument("--warmup-only", action="store_true",
                   help="run the full warmup (populating the persistent "
                        "XLA compile cache, MSMCTTS_COMPILE_CACHE) and "
                        "exit without serving — pay the cold-start "
                        "compile cost once offline; a later serve.py "
                        "start on the warmed cache reaches /healthz in "
                        "seconds")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ HiFi-GAN decoder (1.65x e2e on v5e)")
    p.add_argument("--mesh-devices", type=int, default=1, metavar="N",
                   help="serve data-parallel from the first N devices "
                        "(-1 = all); batch-size must divide N")
    p.add_argument("--sample-rate", type=int, default=None)
    p.add_argument("--max-queue", type=int, default=256)
    p.add_argument("--stream-chunk-frames", type=int, default=64,
                   help="vocoder frames per streamed chunk "
                        "('stream': true requests; 64 = 0.8 s at 24 kHz)")
    p.add_argument("--request-timeout", type=float, default=120.0)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip startup pre-compiles (first requests stall)")
    p.add_argument("--warmup-lengths", type=int, nargs="*", default=None,
                   help="text lengths to pre-compile (default: full ladder)")
    args = p.parse_args()
    if not args.model and not args.artifact:
        p.error("one of -m/--model or --artifact is required")
    from msmctts_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    from msmctts_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()


    if args.warmup_streaming and args.no_warmup_streaming:
        p.error("--warmup-streaming conflicts with --no-warmup-streaming")
    include_streaming = (
        True if args.warmup_streaming
        else False if args.no_warmup_streaming
        else None  # auto: warm streaming whenever the task supports it
    )

    if args.warmup_only:
        engine = build_engine(args)
        secs = engine.warmup(args.warmup_lengths, include_streaming=include_streaming)
        print(json.dumps({"warmup_s": round(secs, 1),
                          "streaming_warmed": engine._streaming_warm}), flush=True)
        sys.exit(0)

    engine = build_engine(args).start()
    ready = threading.Event()
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(engine, ready, args.request_timeout)
    )

    def _warm():
        if not args.no_warmup:
            secs = engine.warmup(
                args.warmup_lengths, include_streaming=include_streaming
            )
            print(f"warmup: compiled serving graphs in {secs:.1f}s "
                  f"(streaming={'warm' if engine._streaming_warm else 'off'})",
                  flush=True)
        ready.set()
        print(f"serving on http://{args.host}:{server.server_port}", flush=True)

    threading.Thread(target=_warm, daemon=True).start()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.stop()
        sys.exit(0)


if __name__ == "__main__":
    main()
