"""Model server: dynamic micro-batching onto static bucket shapes.

Beyond-the-reference deployment surface (the reference stops at
src/bin/recognize.py, an offline batch CLI). TPU-first serving has a
shape problem: the chip wants large, static-shape batches, but traffic
arrives as single utterances at random times. The micro-batcher bridges
the two worlds:

- requests enqueue; a collector thread drains up to `batch_size` of them,
  waiting at most `window_ms` after the first arrival (latency bound);
- each request is assigned the smallest static frame bucket that fits,
  exactly like bin/recognize.py buckets offline datasets;
- per (input-kind, bucket) group, requests are padded into ONE fixed
  [batch_size, T(, D)] batch (absent rows are length-0 dummies, the same
  convention the training loader uses) and decoded by ONE compiled
  program. Every program is compiled at warmup, so steady-state serving
  never compiles and never changes shape.

Streaming sessions ride the incremental recognizers
(tpu_asr.decode.streaming): per-session state on host, KV-cached chunk
programs on device, shared with the offline path's device.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time

import numpy as np


class UtteranceTooLong(ValueError):
    """Input exceeds the longest configured frame bucket (HTTP 413)."""


class SessionExpired(ValueError):
    """Push for a stream session that already finished or was idle-GC'd
    (HTTP 410) — the alternative, silently restarting the hypothesis
    mid-stream, would corrupt the client's transcript."""


@dataclasses.dataclass
class _Request:
    kind: str                      # "feats" | "wav"
    data: np.ndarray               # [T, D] f32 | [S] f32
    bucket: int
    nbest: int
    event: threading.Event = dataclasses.field(default_factory=threading.Event)
    result: list | None = None
    error: str | None = None
    cancelled: bool = False        # submitter gave up (timeout): the
    #                                collector drops it instead of burning
    #                                a batch row on an abandoned decode


class AsrServer:
    """Micro-batching wrapper around a Recognizer.

    recognizer: tpu_asr.decode.recognizer.Recognizer (any mode).
    bucket_frames: ascending static feature-frame buckets; a request is
        padded to the smallest bucket that fits or rejected if too long.
    batch_size: static batch rows per compiled program (and the max
        micro-batch).
    window_ms: max time the collector waits after the first queued
        request before decoding a partial batch.
    """

    def __init__(self, recognizer, bucket_frames=(512, 1000), batch_size=8,
                 window_ms=15.0):
        from tpu_asr.frontend import FrontendConfig
        self.rec = recognizer
        self.bucket_frames = tuple(sorted(bucket_frames))
        self.batch_size = int(batch_size)
        self.window_s = float(window_ms) / 1000.0
        self.frontend = getattr(recognizer, "frontend", None) or \
            FrontendConfig()
        self.d_input = recognizer.cfg.d_input
        self._q: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="asr-batcher")
        self.stats = {"requests": 0, "batches": 0, "rows_decoded": 0}

    # --- lifecycle ---

    def start(self):
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5.0)

    def warmup(self, kinds=("feats", "wav")):
        """Compile every (kind, bucket) program before taking traffic."""
        for kind in kinds:
            for b, t in enumerate(self.bucket_frames):
                reqs = [self._dummy_request(kind, b, t)]
                self._decode_group(kind, b, reqs)
        self.stats.update(requests=0, batches=0, rows_decoded=0)

    def _dummy_request(self, kind, bucket, t):
        if kind == "feats":
            data = np.zeros((t, self.d_input), np.float32)
        else:
            data = np.zeros((t * self.frontend.frame_shift,), np.float32)
        return _Request(kind=kind, data=data, bucket=bucket, nbest=1)

    # --- submission ---

    def _bucket_for(self, n_frames: int) -> int | None:
        for i, t in enumerate(self.bucket_frames):
            if n_frames <= t:
                return i
        return None

    def submit(self, kind: str, data: np.ndarray, nbest: int = 1,
               timeout: float = 60.0) -> list[dict]:
        """Blocking decode of one utterance; thread-safe.

        kind="feats": data [T, d_input] float32 log-mel frames.
        kind="wav":   data [S] float32 samples at frontend.sample_rate.
        Returns the n-best list [{'yseq': [...], 'score': ...}, ...].
        """
        data = np.asarray(data, np.float32)
        if kind == "feats":
            if data.ndim != 2 or data.shape[1] != self.d_input:
                raise ValueError(
                    f"feats must be [T, {self.d_input}], got {data.shape}")
            frames = data.shape[0]
        elif kind == "wav":
            if data.ndim != 1:
                raise ValueError(f"wav must be [S], got {data.shape}")
            frames = data.shape[0] // self.frontend.frame_shift
        else:
            raise ValueError(f"unknown input kind {kind!r}")
        if frames < 1:
            raise ValueError("empty utterance")
        bucket = self._bucket_for(frames)
        if bucket is None:
            raise UtteranceTooLong(
                f"utterance is ~{frames} frames; longest bucket is "
                f"{self.bucket_frames[-1]} (split the audio or restart the "
                f"server with larger --bucket-frames)")
        req = _Request(kind=kind, data=data, bucket=bucket, nbest=nbest)
        self._q.put(req)
        if not req.event.wait(timeout):
            req.cancelled = True
            raise TimeoutError("decode timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    # --- collector ---

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.window_s
            cap = self.batch_size * max(2, len(self.bucket_frames))
            while len(batch) < cap:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            groups: dict[tuple[str, int], list[_Request]] = {}
            for r in batch:
                groups.setdefault((r.kind, r.bucket), []).append(r)
            for (kind, bucket), reqs in groups.items():
                for s in range(0, len(reqs), self.batch_size):
                    chunk = [r for r in reqs[s: s + self.batch_size]
                             if not r.cancelled]
                    if not chunk:
                        continue
                    try:
                        self._decode_group(kind, bucket, chunk)
                    except Exception as e:  # surface, don't kill the loop
                        for r in chunk:
                            r.error = f"{type(e).__name__}: {e}"
                    finally:
                        for r in chunk:
                            r.event.set()

    def _decode_group(self, kind: str, bucket: int, reqs: list[_Request]):
        """Pad a group into the bucket's STATIC [batch_size, ...] shape and
        run one compiled decode; absent rows are length-0 dummies."""
        t = self.bucket_frames[bucket]
        b = self.batch_size
        if kind == "feats":
            arr = np.zeros((b, t, self.d_input), np.float32)
            lens = np.zeros((b,), np.int32)
            for i, r in enumerate(reqs):
                arr[i, : r.data.shape[0]] = r.data
                lens[i] = r.data.shape[0]
            batch = {"feats": arr, "feat_lengths": lens}
        else:
            s = t * self.frontend.frame_shift
            arr = np.zeros((b, s), np.float32)
            lens = np.zeros((b,), np.int32)
            for i, r in enumerate(reqs):
                arr[i, : r.data.shape[0]] = r.data
                lens[i] = r.data.shape[0]
            batch = {"wav": arr, "wav_lengths": lens}
        nbest = self.rec.decode_batch_nbest(batch)
        for r, nb in zip(reqs, nbest):
            r.result = nb[: max(r.nbest, 1)]
        self.stats["requests"] += len(reqs)
        self.stats["batches"] += 1
        self.stats["rows_decoded"] += b


class StreamSessions:
    """Per-session incremental decoding for the /stream endpoint.

    Each session owns a StreamingCTCRecognizer (beam=1),
    StreamingCTCBeamRecognizer (beam>1), or — for transducer models —
    StreamingTransducerRecognizer (append-only emissions); pushes return
    newly-final tokens (greedy/transducer) or the current best prefix
    (beam). Sessions are host state; device programs are shared/jit-cached
    across sessions.
    """

    def __init__(self, cfg, params, beam: int = 1, max_frames: int = 3000,
                 idle_timeout_s: float = 300.0):
        self.cfg, self.params = cfg, params
        self.beam, self.max_frames = beam, max_frames
        self.idle_timeout_s = idle_timeout_s
        # session -> [recognizer, per-session lock, last-touch ts,
        #             finished flag].
        # The global lock guards only the session map and the closed-id
        # ring; the per-session lock serializes that session's decode so
        # independent /stream sessions overlap (ADVICE r3).
        self._sessions: dict[str, list] = {}
        self._lock = threading.Lock()
        # ids that finished or idle-expired: a late push gets an explicit
        # SessionExpired instead of a silently restarted hypothesis.
        # Bounded ring (an OrderedDict-as-LRU) so it can't grow forever.
        from collections import OrderedDict
        self._closed: OrderedDict[str, str] = OrderedDict()
        self._closed_cap = 4096

    def _new_recognizer(self):
        from tpu_asr.decode.streaming import (StreamingCTCBeamRecognizer,
                                              StreamingCTCRecognizer,
                                              StreamingTransducerRecognizer)
        if self.cfg.model_type == "transducer":
            return StreamingTransducerRecognizer(
                self.cfg, self.params, max_frames=self.max_frames)
        if self.beam > 1:
            return StreamingCTCBeamRecognizer(self.cfg, self.params,
                                              beam=self.beam,
                                              max_frames=self.max_frames)
        return StreamingCTCRecognizer(self.cfg, self.params,
                                      max_frames=self.max_frames)

    def _close(self, session_id: str, reason: str):
        """Caller holds self._lock."""
        self._sessions.pop(session_id, None)
        self._closed[session_id] = reason
        self._closed.move_to_end(session_id)
        while len(self._closed) > self._closed_cap:
            self._closed.popitem(last=False)

    def _gc(self, now: float):
        """Caller holds self._lock."""
        dead = [k for k, (_, _, ts, _) in self._sessions.items()
                if now - ts > self.idle_timeout_s]
        for k in dead:
            self._close(k, "expired")

    def push(self, session_id: str, feats: np.ndarray,
             final: bool = False) -> dict:
        """feats: [t, d_input] newly-arrived frames (may be empty with
        final=True to flush). Returns {'new_tokens', 'tokens', 'final'}.

        Raises SessionExpired for an id that already finished or
        idle-expired. The global lock covers only map lookup/GC; the
        decode runs under the per-session lock, so concurrent sessions
        don't serialize behind each other's device work."""
        now = time.monotonic()
        with self._lock:
            self._gc(now)
            entry = self._sessions.get(session_id)
            if entry is None:
                if session_id in self._closed:
                    raise SessionExpired(
                        f"session {session_id!r} already "
                        f"{self._closed[session_id]}; start a new session "
                        f"id (partial hypothesis was discarded)")
                entry = [self._new_recognizer(), threading.Lock(), now,
                         False]
                self._sessions[session_id] = entry
            entry[2] = now
        rec, slock = entry[0], entry[1]
        with slock:
            # A concurrent final push for the same id may have finished the
            # recognizer while we waited on slock (it marks the entry under
            # slock, then removes it from the map under the global lock) —
            # surface the intended SessionExpired, not an AssertionError
            # from pushing into a finished recognizer (ADVICE r4).
            if entry[3]:
                raise SessionExpired(
                    f"session {session_id!r} already finished; start a new "
                    f"session id (partial hypothesis was discarded)")
            feats = np.asarray(feats, np.float32).reshape(-1,
                                                          self.cfg.d_input)
            new = rec.push(feats) if feats.shape[0] else []
            if final:
                tokens = rec.finish()
                entry[3] = True
                resp = {"new_tokens": new, "tokens": tokens, "final": True}
            else:
                cur = (list(rec._tokens) if hasattr(rec, "_tokens")
                       else rec.hypothesis if hasattr(rec, "hypothesis")
                       else None)
                resp = {"new_tokens": new, "tokens": cur, "final": False}
            if hasattr(rec, "hypothesis_times"):
                resp["times"] = rec.hypothesis_times
            if hasattr(rec, "hypothesis_confidence"):
                resp["confidence"] = rec.hypothesis_confidence
        if final:
            with self._lock:
                self._close(session_id, "finished")
        return resp

    @property
    def n_active(self) -> int:
        with self._lock:
            return len(self._sessions)


def _ids_to_text(ids, char_list):
    if not char_list:
        return None
    return "".join(char_list[i] if 0 <= i < len(char_list) else "<unk>"
                   for i in ids)


def make_http_server(host: str, port: int, server: AsrServer,
                     streams: StreamSessions | None = None,
                     char_list: list[str] | None = None):
    """stdlib ThreadingHTTPServer with three endpoints:

    GET  /healthz            -> model/server info + stats
    POST /recognize          -> {"feats": [[...]]} | {"wav": [...]}
                                (+ "nbest": k) -> n-best hypotheses
    POST /stream             -> {"session": id, "feats": [[...]],
                                "final": bool} -> incremental tokens
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):      # quiet: stats live in /healthz
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "not found"})
            self._json(200, {
                "status": "ok",
                "mode": server.rec.mode,
                "model_type": server.rec.cfg.model_type,
                "bucket_frames": list(server.bucket_frames),
                "batch_size": server.batch_size,
                "window_ms": server.window_s * 1000.0,
                "streaming": streams is not None,
                "active_streams": streams.n_active if streams else 0,
                "stats": dict(server.stats),
            })

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": f"bad json: {e}"})
            if self.path == "/recognize":
                return self._recognize(req)
            if self.path == "/stream":
                return self._stream(req)
            return self._json(404, {"error": "not found"})

        def _recognize(self, req: dict):
            if ("feats" in req) == ("wav" in req):
                return self._json(
                    400, {"error": "send exactly one of 'feats'/'wav'"})
            kind = "feats" if "feats" in req else "wav"
            try:
                nb = server.submit(kind, np.asarray(req[kind], np.float32),
                                   nbest=int(req.get("nbest", 1)))
            except UtteranceTooLong as e:
                return self._json(413, {"error": str(e)})
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except TimeoutError as e:
                return self._json(503, {"error": str(e)})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            out = [{"tokens": h["yseq"], "score": h["score"],
                    "text": _ids_to_text(h["yseq"], char_list)}
                   for h in nb]
            return self._json(200, {"nbest": out,
                                    "tokens": out[0]["tokens"],
                                    "text": out[0]["text"]})

        def _stream(self, req: dict):
            if streams is None:
                return self._json(400, {"error": "streaming disabled "
                                        "(--no-streaming or wrong model)"})
            sid = req.get("session")
            if not sid:
                return self._json(400, {"error": "missing 'session'"})
            try:
                out = streams.push(sid, req.get("feats", []),
                                   final=bool(req.get("final", False)))
            except SessionExpired as e:
                return self._json(410, {"error": str(e), "expired": True})
            except Exception as e:
                return self._json(500, {"error": str(e)})
            if out.get("tokens") is not None:
                out["text"] = _ids_to_text(out["tokens"], char_list)
            return self._json(200, out)

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.daemon_threads = True
    return httpd
