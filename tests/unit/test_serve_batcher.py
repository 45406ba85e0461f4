"""Micro-batcher unit tests (tpu_asr/serve.py) with a fake recognizer:
grouping by (kind, bucket), static padding with length-0 dummy rows,
per-request nbest slicing, over-long rejection, and error isolation —
all host logic, no model, fast tier."""

import threading
import time

import numpy as np
import pytest

from tpu_asr.serve import AsrServer, _ids_to_text


class FakeRecognizer:
    """Records every batch it sees; returns per-row nbest derived from the
    row's length so tests can match results back to requests."""

    class _Cfg:
        d_input = 8
        model_type = "hybrid"

    cfg = _Cfg()
    mode = "fake"
    frontend = None

    def __init__(self, fail_on_len=None):
        self.batches = []
        self.fail_on_len = fail_on_len

    def decode_batch_nbest(self, batch):
        self.batches.append(batch)
        key = "feats" if "feats" in batch else "wav"
        lens = batch["feat_lengths" if key == "feats" else "wav_lengths"]
        arr = batch[key]
        if self.fail_on_len is not None and \
                int(self.fail_on_len) in [int(x) for x in lens]:
            raise RuntimeError("boom")
        out = []
        for i in range(arr.shape[0]):
            n = int(lens[i])
            out.append([{"yseq": [n, w], "score": -float(w)}
                        for w in range(3)])
        return out


def _server(rec, **kw):
    kw.setdefault("bucket_frames", (16, 64))
    kw.setdefault("batch_size", 4)
    kw.setdefault("window_ms", 20.0)
    s = AsrServer(rec, **kw)
    s.start()
    return s


def test_batcher_groups_pads_and_slices():
    rec = FakeRecognizer()
    s = _server(rec)
    try:
        results = {}

        def ask(name, frames, nbest):
            results[name] = s.submit(
                "feats", np.ones((frames, 8), np.float32), nbest=nbest)

        threads = [
            threading.Thread(target=ask, args=("a", 10, 1)),
            threading.Thread(target=ask, args=("b", 12, 2)),   # bucket 16
            threading.Thread(target=ask, args=("c", 40, 3)),   # bucket 64
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)

        # results keyed back via the fake's yseq = [row_length, w]
        assert [h["yseq"][0] for h in results["a"]] == [10]
        assert [h["yseq"][0] for h in results["b"]] == [12, 12]
        assert [h["yseq"][0] for h in results["c"]] == [40, 40, 40]

        # every decoded batch had the STATIC batch_size rows and the
        # bucket's static T; absent rows are length-0 dummies
        for b in rec.batches:
            assert b["feats"].shape[0] == 4
            assert b["feats"].shape[1] in (16, 64)
            real = int((b["feat_lengths"] > 0).sum())
            assert (b["feat_lengths"][real:] == 0).all()
        # a+b shared the 16-bucket batch when the window caught both;
        # c went to the 64 bucket — at most 3 batches either way
        assert 2 <= len(rec.batches) <= 3
        assert s.stats["requests"] == 3
    finally:
        s.stop()


def test_batcher_wav_bucketing_and_too_long():
    rec = FakeRecognizer()
    s = _server(rec)   # frame_shift = 160 (FrontendConfig default)
    try:
        out = s.submit("wav", np.zeros(15 * 160, np.float32))
        assert out[0]["yseq"][0] == 15 * 160          # wav length echoed
        assert rec.batches[-1]["wav"].shape == (4, 16 * 160)
        with pytest.raises(ValueError, match="bucket"):
            s.submit("wav", np.zeros(100 * 160, np.float32))
        with pytest.raises(ValueError):
            s.submit("feats", np.zeros((4, 3), np.float32))  # bad d_input
        with pytest.raises(ValueError):
            s.submit("nope", np.zeros(8, np.float32))
    finally:
        s.stop()


def test_batcher_error_isolation():
    """A decode failure errors THOSE requests; the loop keeps serving."""
    rec = FakeRecognizer(fail_on_len=13)
    s = _server(rec)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            s.submit("feats", np.ones((13, 8), np.float32))
        out = s.submit("feats", np.ones((10, 8), np.float32))
        assert out[0]["yseq"][0] == 10
    finally:
        s.stop()


def test_split_oversized_wave_of_requests():
    """More same-bucket requests than batch_size split into chunks."""
    rec = FakeRecognizer()
    s = _server(rec, window_ms=60.0)
    try:
        results = [None] * 7

        def ask(i):
            results[i] = s.submit("feats", np.ones((10 + i, 8), np.float32))

        threads = [threading.Thread(target=ask, args=(i,)) for i in range(7)]
        for t in threads:
            t.start()
            time.sleep(0.002)       # land inside one collection window
        for t in threads:
            t.join(timeout=30)
        assert all(r is not None for r in results)
        assert [r[0]["yseq"][0] for r in results] == [10 + i
                                                      for i in range(7)]
        sizes = [int((b["feat_lengths"] > 0).sum()) for b in rec.batches]
        assert sum(sizes) == 7 and max(sizes) <= 4
    finally:
        s.stop()


def test_ids_to_text():
    assert _ids_to_text([2, 3], ["<b>", "<u>", "x", "y"]) == "xy"
    assert _ids_to_text([9], ["a"]) == "<unk>"
    assert _ids_to_text([1, 2], None) is None


def test_too_long_is_typed_exception():
    """Over-long inputs raise UtteranceTooLong (the 413 mapping keys on
    the type, not on a message substring — ADVICE r3)."""
    from tpu_asr.serve import UtteranceTooLong
    rec = FakeRecognizer()
    s = _server(rec)
    try:
        with pytest.raises(UtteranceTooLong):
            s.submit("feats", np.ones((100, 8), np.float32))
        assert issubclass(UtteranceTooLong, ValueError)  # old catch works
    finally:
        s.stop()


def test_timed_out_request_is_dropped_not_decoded():
    """A request whose submitter timed out is skipped by the collector
    instead of burning a batch slot on an abandoned decode (ADVICE r3)."""

    class SlowRecognizer(FakeRecognizer):
        def decode_batch_nbest(self, batch):
            time.sleep(0.25)                 # let the queued one time out
            return super().decode_batch_nbest(batch)

    rec = SlowRecognizer()
    s = _server(rec, window_ms=1.0)
    try:
        t1 = threading.Thread(
            target=lambda: s.submit("feats", np.ones((5, 8), np.float32)))
        t1.start()
        time.sleep(0.05)                     # t1's batch is now decoding
        with pytest.raises(TimeoutError):
            s.submit("feats", np.ones((6, 8), np.float32), timeout=0.05)
        t1.join(timeout=10)
        time.sleep(0.5)                      # give the collector a beat
        lens = sorted(int(l) for b in rec.batches
                      for l in b["feat_lengths"] if int(l) > 0)
        assert lens == [5], lens             # the abandoned 6-row never ran
    finally:
        s.stop()


def test_stream_sessions_expired_and_concurrent():
    """StreamSessions: a finished/expired id raises SessionExpired (no
    silent hypothesis restart), and the decode runs outside the global
    lock so independent sessions overlap (ADVICE r3)."""
    from tpu_asr.serve import SessionExpired, StreamSessions

    class FakeStreamRec:
        gate = threading.Barrier(2, timeout=5.0)

        def __init__(self, cfg, params, **kw):
            self._tokens = []

        def push(self, feats):
            # both sessions must be in here at once to pass the barrier —
            # impossible if push serializes under the global lock
            FakeStreamRec.gate.wait()
            self._tokens.append(1)
            return [1]

        def finish(self):
            return list(self._tokens)

    class _Cfg:
        d_input = 8
        model_type = "ctc"

    ss = StreamSessions(_Cfg(), {}, beam=1)
    ss._new_recognizer = lambda: FakeStreamRec(None, None)

    outs = {}

    def run(sid):
        outs[sid] = ss.push(sid, np.ones((4, 8), np.float32))

    threads = [threading.Thread(target=run, args=(f"s{i}",))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert outs["s0"]["new_tokens"] == [1] and outs["s1"]["new_tokens"] == [1]

    # finish s0, then push again: explicit error, not a silent restart
    final = ss.push("s0", np.zeros((0, 8), np.float32), final=True)
    assert final["final"] and final["tokens"] == [1]
    with pytest.raises(SessionExpired, match="finished"):
        ss.push("s0", np.ones((4, 8), np.float32))

    # idle-expire s1, then push again: same contract
    ss.idle_timeout_s = 0.0
    time.sleep(0.01)
    with pytest.raises(SessionExpired, match="expired"):
        ss.push("s1", np.ones((4, 8), np.float32))


def test_stream_sessions_final_race_raises_expired():
    """A push that grabbed the session entry BEFORE a concurrent final
    push closed it must get SessionExpired once it acquires the session
    lock — not an internal error from pushing into a finished recognizer
    (ADVICE r4: the close used to happen only after the per-session lock
    was released, leaving a window)."""
    from tpu_asr.serve import SessionExpired, StreamSessions

    class FakeStreamRec:
        def __init__(self):
            self._tokens = []
            self.finished = False

        def push(self, feats):
            assert not self.finished, "push after finish"
            self._tokens.append(1)
            return [1]

        def finish(self):
            self.finished = True
            return list(self._tokens)

    class _Cfg:
        d_input = 8
        model_type = "ctc"

    ss = StreamSessions(_Cfg(), {}, beam=1)
    ss._new_recognizer = lambda: FakeStreamRec()
    ss.push("s0", np.ones((2, 8), np.float32))
    entry = ss._sessions["s0"]

    # interleave exactly like the race: the late pusher already holds the
    # entry; the final push finishes the recognizer while the late pusher
    # is blocked on the per-session lock
    late_result = {}

    def late_push():
        with entry[1]:           # hold slock so the final push must wait
            threading.Thread(target=run_final).start()
            time.sleep(0.1)      # final push is now blocked on slock
        # slock released -> final push completes -> our re-push must see
        # the finished flag
        time.sleep(0.3)
        try:
            ss.push("s0", np.ones((2, 8), np.float32))
            late_result["outcome"] = "no error"
        except SessionExpired:
            late_result["outcome"] = "expired"
        except Exception as e:  # noqa: BLE001
            late_result["outcome"] = f"wrong error: {e!r}"

    def run_final():
        ss.push("s0", np.zeros((0, 8), np.float32), final=True)

    t = threading.Thread(target=late_push)
    t.start()
    t.join(timeout=10)
    assert late_result["outcome"] == "expired", late_result

    # and the tighter window: entry captured, THEN finished, then pushed —
    # the guard under slock must fire even though the id is gone from the map
    ss2 = StreamSessions(_Cfg(), {}, beam=1)
    ss2._new_recognizer = lambda: FakeStreamRec()
    ss2.push("x", np.ones((2, 8), np.float32))
    captured = ss2._sessions["x"]
    ss2.push("x", np.zeros((0, 8), np.float32), final=True)
    assert captured[3] is True   # finished flag set under slock
