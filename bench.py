"""North-star benchmark: embed + retrieve ViQuAE-scale queries over a
1.5M-entity KB on the attached TPU.

Prints a result JSON line after EVERY completed stage (the driver parses
the tail: the last line is always the most complete result). The headline
stage runs FIRST so a crash in any later stage can never erase it.

Protocol (mirrors BASELINE.json): 1,257 test questions embedded by a
bert-base DPR question tower and searched against a 1.5M x 768 KB with the
EXACT single-pass MIPS engine (ops.mips_pallas.topk_fused — the Pallas
q-major scores+segmax kernel + one global selection), k=100. Question token
lengths are drawn from lognormal(ln 18, 0.35) clipped to [8, 64] — a
TriviaQA-style distribution (ViQuAE questions are rewritten TriviaQA
questions; the reference pads them all to 256 tokens,
experiments/ir/viquae/dpr/questions/config.json). The query tower runs the
PACKED path (ops/packing.py): many questions per row of one fixed
(rows, 64) canvas with block-diagonal attention — packed-vs-padded parity
is proven in tests/test_packing.py.

Robustness contract (BENCH_r03 post-mortem — a recoverable OOM lost the
whole round's number):
- stages run independently, headline ("exact") first; each completed
  stage's details persist to .bench_cache/stages_<git-sha>*.json;
- a failed stage triggers ONE fresh-process retry (os.execve) that skips
  every cached stage; a second failure marks the stage failed and the run
  continues;
- the first OOM-ish failure switches the remaining run to the half-batch
  protocol (VIQUAE_BENCH_HALF=1: 628 queries / 640-slot canvas — halves
  the 3.8GB score buffer);
- ONE total deadline (VIQUAE_BENCH_DEADLINE, epoch seconds) rides through
  every exec; watchdog threads emit the best-available JSON before the
  driver's external timeout can kill the process silently.

Recovery contract (VERDICT r4 item 1 — one bad HBM window must not be
permanently recorded as the round's number):
- before each HBM-heavy stage, PROBE the window (largest single bf16
  allocation that succeeds + a fixed host-matmul canary); a dirty probe
  DEFERS the stage to the back of the queue (up to 8 times, waiting out
  co-tenant pressure) instead of degrading, while deadline headroom
  lasts — in DEGRADED runs too, against a halved threshold;
- an OOM whose pre-probe read a WEDGED window (<1GB free: even tiny
  programs fail — observed live 2026-08-20) consumes NO attempt and
  never escalates the degrade ladder: the run re-execs, sleeps 60s with
  the chip released, and retries (bounded by deadline + a global cap);
- after all stages land, remaining deadline is spent RE-RUNNING
  half-batch AND fully-errored stages at full batch
  (VIQUAE_BENCH_RECOVER=a,b rides the exec; one attempt per stage, best
  honest result kept — a failed recovery keeps the degraded number, and
  a dirty recovery probe WAITS instead of burning the attempt);
- every stage's probe state is recorded in the JSON under
  "stage_health" ({degraded, free_hbm_gb, canary_ms, recovered}) so a
  squeezed number is labeled, not silent.

Env knobs: BENCH_SMALL=1 (tiny shapes), BENCH_PLATFORM=cpu (functional
smoke), VIQUAE_BENCH_BUDGET (total seconds, default 2250),
VIQUAE_BENCH_STAGES=a,b (subset), VIQUAE_BENCH_CACHE_DIR,
VIQUAE_BENCH_FAKE_OOM=<stage> (drill: inject one RESOURCE_EXHAUSTED),
VIQUAE_BENCH_FAKE_PROBE="v1:t1,v2" (drill: probe reads v1 GB until t1
seconds into the run, then v2), VIQUAE_BENCH_DEFER_WAIT (seconds).

Parity keys (labels say exactly what was measured):
- approx_r_at_20_vs_exact_fullkb: lax.approx_max_k top-20 vs exact top-20,
  FULL 1.5M KB, on device, all 1,257 queries.
- r_at_20_fast_vs_exact_fullkb:   chunked two-level selection ("fast") vs
  exact, FULL KB, on device.
- r_at_20_fp32_contract_262k_slice: fp32-HIGHEST fast-vs-exact on a 262k
  slice — the FAISS-flat fp32 contract at bench scale; the full
  FAISS-tie-order contract is tested in tests/test_mips.py.
"""
from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

NORTH_STAR_QPS = 10_000.0
SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))
DEGRADED = os.environ.get("VIQUAE_BENCH_HALF") == "1"
CHUNKED = os.environ.get("VIQUAE_BENCH_CHUNKED") == "1"
RECOVER = [s for s in os.environ.get("VIQUAE_BENCH_RECOVER", "").split(",")
           if s]
# generous per-stage cold-compile cost estimates; gate STARTING a stage
# near the deadline (the watchdog still guards a stage that overruns)
STAGE_EST_S = {
    "exact": 420, "fusion": 120, "hybrid": 420, "parity": 180,
    "reader": 150, "image_chain": 180, "train": 240,
}
FINAL_MARGIN_S = 60
# minimum probed single-allocation headroom (GB) to START a stage at full
# batch: the largest single buffer each full-batch program materializes
# (exact/parity: 3.8GB bf16 score matrix; hybrid: 3GB q_block=512 f32
# score block; fusion rides the exact program; train: ~2GB remat peaks)
STAGE_MIN_PROBE_GB = {
    "exact": 4, "fusion": 4, "hybrid": 4, "parity": 4, "train": 2,
    "reader": 1, "image_chain": 1,
}
MAX_DEFERS = 8
DEFER_WAIT_S = float(os.environ.get("VIQUAE_BENCH_DEFER_WAIT", "60"))
# a probe below this is a WEDGED window (observed 2026-08-20: even the
# tiny reader program OOMs; an OOM then says nothing about the program)
WEDGE_GB = 1.0
MAX_WEDGE_WAITS = 30  # global, across execs; deadline is the real bound
# recovery order: headline first, then the stages the round is judged on
RECOVER_ORDER = ["exact", "hybrid", "fusion", "train", "reader",
                 "image_chain", "parity"]

_EMIT_LOCK = threading.Lock()
_CACHE = None  # set in main(); watchdogs read it


def _deadline() -> float:
    if "VIQUAE_BENCH_DEADLINE" not in os.environ:
        budget = float(os.environ.get("VIQUAE_BENCH_BUDGET", "2250"))
        os.environ["VIQUAE_BENCH_DEADLINE"] = str(time.time() + budget)
    return float(os.environ["VIQUAE_BENCH_DEADLINE"])


DEADLINE = _deadline()


def time_left() -> float:
    return DEADLINE - time.time()


def _cache_dir() -> str:
    return os.environ.get(
        "VIQUAE_BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache"))


def _git_sha() -> str:
    # pinned into the env at first start so exec retries keep reading the
    # SAME cache file even if HEAD moves mid-run (a commit landing while
    # the bench runs must not orphan completed stages)
    if "VIQUAE_BENCH_SHA" in os.environ:
        return os.environ["VIQUAE_BENCH_SHA"]
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "nosha"
    except Exception:  # noqa: BLE001
        sha = "nosha"
    os.environ["VIQUAE_BENCH_SHA"] = sha
    return sha


class StageCache:
    """Per-stage results persisted across exec retries (keyed by git sha,
    BENCH_SMALL, and platform so a code change invalidates everything)."""

    def __init__(self):
        tag = _git_sha()
        if SMALL:
            tag += "-small"
        plat = os.environ.get("BENCH_PLATFORM")
        if plat:
            tag += f"-{plat}"
        if os.environ.get("VIQUAE_BENCH_DRILL"):
            tag += "-drill"
        self.path = os.path.join(_cache_dir(), f"stages_{tag}.json")
        self.data = {"stages": {}, "attempts": {}, "errors": {}}
        try:
            with open(self.path) as f:
                self.data = json.load(f)
        except Exception:  # noqa: BLE001
            pass

    def _save(self):
        try:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.data, f)
            os.replace(tmp, self.path)
        except OSError:
            pass  # a read-only disk must not kill the bench

    def done(self, name):
        return name in self.data["stages"]

    def stage(self, name):
        return self.data["stages"].get(name)

    def put(self, name, details, recovered: bool = False):
        self.data["stages"][name] = {
            "details": details, "half": DEGRADED, "ts": time.time(),
            "recovered": recovered}
        self.data["errors"].pop(name, None)
        self._save()

    def attempts(self, name) -> int:
        return self.data["attempts"].get(name, 0)

    def bump_attempts(self, name) -> int:
        n = self.attempts(name) + 1
        self.data["attempts"][name] = n
        self._save()
        return n

    def put_error(self, name, err):
        self.data["errors"][name] = err
        self._save()

    def put_health(self, name, health: dict):
        self.data.setdefault("health", {}).setdefault(name, {}).update(
            health)
        self._save()

    def health(self, name) -> dict:
        return self.data.get("health", {}).get(name, {})

    def wedge_waits(self) -> int:
        return self.data.get("wedge_waits", 0)

    def bump_wedge(self) -> int:
        n = self.wedge_waits() + 1
        self.data["wedge_waits"] = n
        self._save()
        return n

    def recover_attempts(self, name) -> int:
        return self.data.get("recover", {}).get(name, 0)

    def bump_recover(self, name) -> int:
        n = self.recover_attempts(name) + 1
        self.data.setdefault("recover", {})[name] = n
        self._save()
        return n


def _assemble(cache: StageCache, final: bool, note: str | None = None):
    details = {
        "kb_rows": 150_000 if SMALL else 1_500_000,
        "dim": 768,
        "k": 100,
    }
    half_stages = []
    for name, rec in cache.data["stages"].items():
        details.update(rec["details"])
        if rec.get("half"):
            half_stages.append(name)
    if half_stages:
        details["degraded_half_batch"] = (
            "628 queries / 640-slot canvas on stages "
            f"{sorted(half_stages)} (full-batch attempt hit the "
            "shared-chip HBM floor)"
            + ("; + chunked fused scoring (deepest degrade level)"
               if CHUNKED else ""))
    # per-stage window labels: a squeezed number must be labeled, never
    # silent (VERDICT r4 item 1c)
    health = {}
    for name, rec in cache.data["stages"].items():
        h = dict(cache.health(name))
        h["degraded"] = bool(rec.get("half"))
        if rec.get("recovered"):
            h["recovered"] = True
        health[name] = h
    for name in cache.data.get("health", {}):
        health.setdefault(name, dict(cache.health(name)))
    if health:
        details["stage_health"] = health
    if cache.data["errors"]:
        details["stage_errors"] = dict(cache.data["errors"])
    if cache.wedge_waits():
        details["wedge_waits"] = cache.wedge_waits()
    pending = [n for n, _, _ in _active_stages()
               if not cache.done(n) and n not in cache.data["errors"]]
    if pending:
        details["stages_pending"] = pending
    if note:
        details["note"] = note
    if not final:
        details["partial"] = True
    exact = cache.stage("exact")
    qps = exact["details"].get("exact_qps") if exact else None
    return {
        "metric": "embed+search queries/sec over 1.5M-entity KB "
                  "(1 chip, exact)",
        "value": qps,
        "unit": "queries/sec",
        "vs_baseline": (round(qps / NORTH_STAR_QPS, 4)
                        if qps is not None else None),
        "details": details,
    }


def emit(cache: StageCache, final: bool, note: str | None = None):
    """Print the current best-available result as ONE flushed JSON line.

    Called after every stage — the driver reads the LAST parseable line in
    the tail, so even a SIGKILL at any later point leaves a valid result."""
    with _EMIT_LOCK:
        print(json.dumps(_assemble(cache, final, note)), flush=True)


def sync(x):
    import jax

    # on the tunneled axon platform block_until_ready is unreliable; force a
    # tiny device->host transfer instead
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


# probes are meaningful only on the real chip: the cpu-platform smoke and
# drill modes must not try to allocate 8GB of host RAM on this small VM
PROBE_ENABLED = (os.environ.get("VIQUAE_BENCH_FAKE_PROBE") is not None
                 or (not SMALL and not os.environ.get("BENCH_PLATFORM")
                     and not os.environ.get("VIQUAE_BENCH_DRILL")))


def probe_free_hbm(jax, jnp,
                   sizes_gb=(8.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0, 0.5),
                   hang_guard_s=180.0):
    """Largest single bf16 device allocation that currently succeeds, in
    GB (descending ladder; free HBM on the shared chip FLUCTUATES —
    CLAUDE.md round-3/4). A failed alloc raises RESOURCE_EXHAUSTED as a
    normal python exception and costs only the attempt.

    The ladder reaches 0.5GB so 1-2GB windows are distinguishable from a
    true wedge (the reader/image_chain 1GB gates and WEDGE_GB depend on
    that resolution).

    Hang guard: the worst wedge mode (observed 2026-08-20) HANGS the
    alloc inside native PJRT instead of failing it — no python exception
    ever surfaces, and the stage watchdog would burn the whole budget.
    A daemon timer treats a probe stuck >hang_guard_s as a wedged
    window: count a wedge wait and exec a fresh process that sleeps
    first (execve from the timer thread tears down the stuck native
    call with the rest of the process)."""
    fake = os.environ.get("VIQUAE_BENCH_FAKE_PROBE")
    if fake and fake != "hang":
        # drill hook: "v1:t1,v2" — probe reads v1 GB until t1 seconds
        # into the run, then v2 (a wedge that clears; rides execs)
        first, after = fake.split(",", 1)
        v1, t1 = first.split(":")
        start = DEADLINE - float(os.environ.get("VIQUAE_BENCH_BUDGET",
                                                "2250"))
        return float(v1 if time.time() - start < float(t1) else after)
    hang_guard_s = float(os.environ.get("VIQUAE_BENCH_PROBE_GUARD",
                                        hang_guard_s))

    def _hang():
        print("bench: HBM probe stuck >"
              f"{hang_guard_s:.0f}s (hang-wedged tunnel)",
              file=sys.stderr, flush=True)
        cache = _CACHE
        if cache is not None:
            n = cache.bump_wedge()
            if n >= MAX_WEDGE_WAITS or time_left() < 300:
                emit(cache, final=False,
                     note="probe hang at wedge cap/deadline; emitting "
                          "best available")
                os._exit(0)
        sys.stderr.flush()
        sys.stdout.flush()
        env = dict(os.environ,
                   VIQUAE_BENCH_SLEEP=str(DEFER_WAIT_S),
                   VIQUAE_BENCH_DEADLINE=str(DEADLINE))
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)

    guard = threading.Timer(hang_guard_s, _hang)
    guard.daemon = True
    guard.start()
    try:
        if fake == "hang":  # drill: a native alloc hang, forever
            time.sleep(1e6)
        for gb in sizes_gb:
            n = int(gb * (1 << 30) // 2)
            try:
                buf = jnp.zeros((n,), jnp.bfloat16)
                sync(buf)
                del buf
                gc.collect()
                return float(gb)
            except Exception as e:  # noqa: BLE001
                if not _is_oom(repr(e)):
                    raise
                gc.collect()
        return 0.0
    finally:
        guard.cancel()


def host_canary_ms() -> float:
    """Fixed host matmul (1k^3 fp64, 3 reps): ~uncontended nominal is
    recorded per stage so co-tenant CPU pressure is labeled in the JSON
    (round-4 lesson: my own pytest run poisoned the bm25 canary)."""
    a = np.random.default_rng(0).standard_normal((1000, 1000))
    t0 = time.perf_counter()
    for _ in range(3):
        a @ a  # noqa: B018 — timed BLAS call
    return (time.perf_counter() - t0) / 3 * 1e3


def r_at_20(idx, ref_idx, n):
    return float(np.mean([
        len(set(idx[i][:20]) & set(ref_idx[i][:20])) / 20 for i in range(n)
    ]))


# ===========================================================================
# lazily-built shared device context (rebuilt cheaply in each exec retry)
# ===========================================================================

class Ctx:
    def __init__(self, jax, jnp):
        self.jax, self.jnp = jax, jnp
        self.small = SMALL
        self.n_kb = 150_000 if SMALL else 1_500_000
        self.dim, self.k, self.row_len = 768, 100, 64
        self.n_queries, self.q_pad = (628, 640) if DEGRADED else (1257, 1280)
        self.key = jax.random.key(0)
        self.reps = 5
        self._model = None
        self._params_f32 = None
        self._kbt = None
        self._fns = None

    def model(self):
        """(cfg, params16, p_args, packed, lengths) — bf16 DPR tower plus
        the packed question canvas. Fixed seeds keep the canvas shape
        stable across processes -> compile-cache hits."""
        if self._model is None:
            jax, jnp = self.jax, self.jnp
            from viquae_tpu.models import bert, dpr
            from viquae_tpu.ops import packing

            cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
            params = dpr.init(jax.random.fold_in(self.key, 2), cfg)
            self._params_f32 = params
            # a bf16 serving deployment stores bf16 weights: precasting
            # skips the per-forward f32->bf16 conversion reads (~440MB
            # f32/step). The fp32 FAISS-contract path keeps the originals.
            params16 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params)
            rng = np.random.default_rng(0)
            lengths = np.clip(
                np.round(rng.lognormal(np.log(18.0), 0.35, self.n_queries)),
                8, self.row_len).astype(int)
            seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32)
                    for l in lengths]
            packed = packing.pack_token_sequences(
                seqs, row_len=self.row_len, n_cls=self.q_pad, pad_rows_to=32)
            p_args = tuple(jnp.asarray(a) for a in (
                packed.input_ids, packed.segment_ids, packed.position_ids,
                packed.cls_rows, packed.cls_cols))
            self._model = (cfg, params16, p_args, packed, lengths)
        return self._model

    def params_f32(self):
        self.model()
        return self._params_f32

    def kbt(self):
        """(d, N) kernel-layout KB, generated DIRECTLY in kernel layout
        (one fused program: RNG + pad-column zeroing): peak 2.3GB instead
        of the 4.6GB row-major-then-transpose build — round 4's biggest
        full-batch OOM source, now gone in ALL modes (it landed exact
        9,220 q/s in a window that OOMed the old build twice). The
        synthetic values differ from the row-major stages' KB, which is
        fine — every consumer (exact/approx recall, fusion, hybrid)
        compares results against the SAME kbt, and the parity stage
        builds its own row-major KB."""
        if self._kbt is None:
            jax, jnp = self.jax, self.jnp

            tile = 512
            n_total = self.n_kb + ((-self.n_kb) % tile)
            n_kb, dim = self.n_kb, self.dim
            key = jax.random.fold_in(self.key, 1)

            @jax.jit
            def gen_kbt():
                x = jax.random.normal(
                    key, (dim, n_total), jnp.bfloat16) / np.sqrt(dim)
                col = jnp.arange(n_total, dtype=jnp.int32)[None, :]
                return jnp.where(col < n_kb, x, 0)  # fused under jit

            self._kbt = gen_kbt()
            sync(self._kbt)
        return self._kbt

    def free_kbt(self):
        self._kbt = None
        self._fns = None
        gc.collect()

    def kb_row(self):
        """Fresh row-major (N, d) KB. NOT the same values as kbt():
        kbt generates directly in (d, N) layout, so the same seed yields
        a DIFFERENT draw — never cross-compare kb_row-based top-k with
        kbt-based top-k (each stage's parity is self-contained)."""
        jax, jnp = self.jax, self.jnp
        kb = jax.random.normal(
            jax.random.fold_in(self.key, 1), (self.n_kb, self.dim),
            jnp.bfloat16) / np.sqrt(self.dim)
        return kb

    def embed_packed(self, params, ids, seg, pos, cr, cc):
        from viquae_tpu.models import dpr

        cfg = self.model()[0]
        return dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=self.jnp.bfloat16,
        ).astype(self.jnp.bfloat16)

    def search_fns(self):
        """jitted (embed_and_search_exact, embed_and_search_approx)."""
        if self._fns is None:
            jax, jnp = self.jax, self.jnp
            from viquae_tpu.ops import mips, mips_pallas

            n_kb, k = self.n_kb, self.k

            # deepest degrade level halves the materialized score buffer
            # too (chunks=2: (Q, N) bf16 -> two (Q, N/2) slabs, result
            # bit-identical — tests/test_mips.py::test_topk_fused_chunked_*
            # — at a measured 21% qps toll, so only when half batch alone
            # still hits the HBM floor)
            fused_chunks = 2 if CHUNKED else 1

            @jax.jit
            def embed_and_search(params, ids, seg, pos, cr, cc, kbt):
                # exact path: Pallas q-major fused scores+segmax kernel
                # + one global selection
                q = self.embed_packed(params, ids, seg, pos, cr, cc)
                return mips_pallas.topk_fused(
                    q, kbt, k, valid_rows=jnp.int32(n_kb),
                    chunks=fused_chunks)

            @jax.jit
            def embed_and_search_approx(params, ids, seg, pos, cr, cc, kbt):
                q = self.embed_packed(params, ids, seg, pos, cr, cc)
                return mips.topk_global(
                    q, kbt, k, valid_rows=jnp.int32(n_kb),
                    compute_dtype=jnp.bfloat16, mode="approx",
                    transposed=True)

            self._fns = (embed_and_search, embed_and_search_approx)
        return self._fns


# ===========================================================================
# stages — each returns a flat dict of detail fields
# ===========================================================================

def stage_exact(ctx: Ctx):
    """Headline: packed embed + Pallas-fused exact search, plus the approx
    variant and its recall vs exact. Runs FIRST."""
    jnp = ctx.jnp
    from viquae_tpu.ops import packing

    cfg, params16, p_args, packed, lengths = ctx.model()
    kbt = ctx.kbt()
    f_exact, f_approx = ctx.search_fns()

    t0 = time.time()
    out = f_exact(params16, *p_args, kbt)
    sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(ctx.reps):
        out = f_exact(params16, *p_args, kbt)
    sync(out)
    dt = (time.time() - t0) / ctx.reps
    qps = ctx.n_queries / dt  # count only the real queries

    out_a = f_approx(params16, *p_args, kbt)
    sync(out_a)
    t0 = time.time()
    for _ in range(ctx.reps):
        out_a = f_approx(params16, *p_args, kbt)
    sync(out_a)
    approx_qps = ctx.n_queries / ((time.time() - t0) / ctx.reps)
    r20_approx = r_at_20(np.asarray(out_a[1]), np.asarray(out[1]),
                         ctx.n_queries)
    del out, out_a
    return {
        "exact_qps": round(qps, 1),
        "batch_ms": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "encoder": "dpr-bert-base bf16, packed canvas "
                   f"({packed.rows}x{ctx.row_len}, density "
                   f"{packing.packing_efficiency(packed):.3f})",
        "question_len_tokens": "lognormal(ln18,0.35) clip [8,64], "
                               f"mean {lengths.mean():.1f}",
        "topk_mode": "pallas-fused scores+segmax kernel, exact global "
                     "selection, bf16 scores",
        "approx_qps": round(approx_qps, 1),
        "approx_r_at_20_vs_exact_fullkb": round(r20_approx, 4),
    }


def stage_fusion(ctx: Ctx):
    """3-index late fusion in ONE program (the reference's best-quality
    config shape: dpr+clip+face wsum [0.6,0.2,0.2], gzmuv, defmin —
    experiments/ir/viquae/dpr+clip-cross-modal/config_test.json). The
    reference runs fusion offline over run files."""
    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.ops import fusion as fusion_ops, mips, mips_pallas

    cfg, params16, p_args, _, _ = ctx.model()
    kbt = ctx.kbt()
    n_kb, k, q_pad = ctx.n_kb, ctx.k, ctx.q_pad
    n_face = 50_624 if ctx.small else 506_237  # humans_with_faces
    kb_clip = jax.random.normal(
        jax.random.fold_in(ctx.key, 7), (n_kb, 512), jnp.bfloat16
    ) / np.sqrt(512)
    kb_face = jax.random.normal(
        jax.random.fold_in(ctx.key, 8), (n_face, 512), jnp.bfloat16
    ) / np.sqrt(512)
    q_clip = jax.random.normal(
        jax.random.fold_in(ctx.key, 9), (q_pad, 512), jnp.bfloat16)
    q_face = jax.random.normal(
        jax.random.fold_in(ctx.key, 10), (q_pad, 512), jnp.bfloat16)

    @jax.jit
    def fusion_program(params, ids, seg, pos, cr, cc, q_clip, q_face,
                       kbt, kb_clip, kb_face):
        q = ctx.embed_packed(params, ids, seg, pos, cr, cc)
        s0, i0 = mips_pallas.topk_fused(q, kbt, k,
                                        valid_rows=jnp.int32(n_kb))
        s1, i1 = mips.topk_global(q_clip, kb_clip, k,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        s2, i2 = mips.topk_global(q_face, kb_face, k,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        return fusion_ops.fuse_topk(
            (s0, s1, s2),
            (i0.astype(jnp.int32), i1.astype(jnp.int32),
             i2.astype(jnp.int32)),
            (0.6, 0.2, 0.2), k, norm="gzmuv",
            valid_queries=jnp.int32(ctx.n_queries))

    args = (params16, *p_args, q_clip, q_face, kbt, kb_clip, kb_face)
    out_f = fusion_program(*args)
    sync(out_f)
    t0 = time.time()
    for _ in range(ctx.reps):
        out_f = fusion_program(*args)
    sync(out_f)
    fusion_qps = ctx.n_queries / ((time.time() - t0) / ctx.reps)
    del kb_clip, kb_face, q_clip, q_face, out_f, args
    return {
        "fusion_3index_qps": round(fusion_qps, 1),
        "fusion_3index_config": "dpr(1.5Mx768 pallas-exact) + "
                                "clip(1.5Mx512 approx) + "
                                "face(506kx512 approx), wsum "
                                "[.6,.2,.2] gzmuv defmin, one program",
    }


def _bm25_corpus(n_docs: int, vocab_size: int = 400_000):
    """Synthetic Zipf passage corpus at KB scale (ops.bm25.synth_zipf_index)
    with an on-disk postings cache — the 1.5M build costs ~2 min of host
    time once, then loads in seconds."""
    from viquae_tpu.ops import bm25 as bm25_lib

    # cache key carries ALL generation params — a key of n_docs alone
    # silently reused a stale index after a vocab/corpus-shape change
    cache = os.path.join(_cache_dir(), f"bm25_{n_docs}_v{vocab_size}")
    if os.path.exists(os.path.join(cache, "postings.npz")):
        return bm25_lib.BM25Index.load(cache)
    index = bm25_lib.synth_zipf_index(n_docs, vocab_size=vocab_size)
    try:
        index.save(cache)
    except OSError:
        pass
    return index


def stage_hybrid(ctx: Ctx):
    """Hybrid sparse+dense. Round 4: BM25 scores on the TPU
    (ops/bm25_device.py — head-matmul + tiered tail gather/scatter; the
    host C++ MaxScore leg was pinned at ~387 q/s by this VM's single core
    and capped the whole hybrid there). The host scorer stays as the
    overflow fallback and is still timed as the cross-round co-tenancy
    canary. Reference mode: meerqat/ir/search.py:268-293 (b=.3/k1=.5)."""
    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.ops import fusion as fusion_ops
    from viquae_tpu.ops.bm25_device import DeviceBM25

    cfg, params16, p_args, _, _ = ctx.model()
    kbt = ctx.kbt()
    f_exact, _ = ctx.search_fns()
    n_queries, q_pad, k = ctx.n_queries, ctx.q_pad, ctx.k

    bm25_index = _bm25_corpus(ctx.n_kb)
    bm25_rng = np.random.default_rng(3)
    bm25_queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}"
                 for z in bm25_rng.zipf(1.2, 8))
        for _ in range(n_queries)
    ]

    # bm25 alone (host, single core); build the MaxScore upper bounds
    # (one-off index cost) AND warm the lazy C++ scorer (first call may
    # g++-compile / ctypes-load the .so) before timing queries
    _ = bm25_index.term_ub
    bm25_index.search_batch(bm25_queries[:8], k=k)
    t0 = time.time()
    bm25_index.search_batch(bm25_queries, k=k)
    bm25_qps = n_queries / (time.time() - t0)

    # device index: per-posting weights + ~520MB one-time upload.
    # q_block 512 amortizes the head-matrix read + per-block transfer
    # overhead (1.6x vs 128 at batch 1280, scripts/exp_bm25_qblock.py);
    # degraded mode keeps 128 — the (q_block, n_docs) f32 score block is
    # 3GB at 512 x 1.5M, exactly what a squeezed-HBM window can't spare
    q_block = 128 if DEGRADED else 512
    t0 = time.time()
    bm25_dev = DeviceBM25(bm25_index, q_block=q_block)
    dev_build_s = time.time() - t0
    bm25_dev.search_batch(bm25_queries[:q_block], k=k)  # compile
    t0 = time.time()
    bm25_dev.search_batch(bm25_queries, k=k)
    bm25_dev_qps = n_queries / (time.time() - t0)

    @jax.jit
    def fuse_hybrid(d_s, d_i, b_s, b_i):
        return fusion_ops.fuse_topk(
            (d_s, b_s), (d_i.astype(jnp.int32), b_i), (0.7, 0.3), k,
            norm="gzmuv", valid_queries=jnp.int32(n_queries))

    def one_hybrid_pass():
        d_s, d_i = f_exact(params16, *p_args, kbt)  # async
        # device-resident bm25 results: no pull-pad-reupload round-trip
        b_s, b_i = bm25_dev.search_batch_device(bm25_queries, k=k)
        return fuse_hybrid(d_s, d_i, b_s[:q_pad], b_i[:q_pad])

    out_h = one_hybrid_pass()
    sync(out_h)
    t0 = time.time()
    h_reps = 2
    for _ in range(h_reps):
        out_h = one_hybrid_pass()
    sync(out_h)
    hybrid_qps = n_queries / ((time.time() - t0) / h_reps)
    # overflowed queries fall back to the host scorer INSIDE the timed
    # loop: label the rate next to the throughput (round-4 lesson — a
    # retuned pool can deflate qps and inflate parity silently)
    overflow = int(bm25_dev.last_overflow)
    del out_h, bm25_dev
    return {
        "bm25_qps": round(bm25_qps, 1),
        "bm25_device_overflow": f"{overflow}/{n_queries} queries "
                                "host-fallbacked in the last pass",
        "bm25_config": f"{ctx.n_kb} Zipf passages, 400k vocab, C++ "
                       "MaxScore, b=0.3 k1=0.5, k=100, "
                       f"{os.cpu_count()} host core(s)",
        "bm25_device_qps": round(bm25_dev_qps, 1),
        "bm25_device_config": "TPU head-matmul(512)+tiered tail "
                              f"gather/scatter, q_block={q_block}, build "
                              f"{dev_build_s:.0f}s one-time "
                              "(ops/bm25_device.py)",
        "hybrid_qps": round(hybrid_qps, 1),
        "hybrid_config": "dense pallas-exact + device bm25 + device "
                         "gzmuv fusion [.7,.3], all on-chip",
    }


def stage_parity(ctx: Ctx):
    """Selection-contract checks on the ROW-major KB: chunked "fast"
    two-level selection vs exact over the full KB, and the fp32
    FAISS-flat contract on a 262k slice (precision=HIGHEST; the full
    FAISS tie-order contract lives in tests/test_mips.py — pulling the
    4.6GB fp32 KB to host over the tunnel is too slow for the bench)."""
    ctx.free_kbt()  # row-major kb + 3.8GB topk_global scores need the room
    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.models import dpr
    from viquae_tpu.ops import mips

    cfg, params16, p_args, _, _ = ctx.model()
    kb = ctx.kb_row()

    @jax.jit
    def embed_only(params, ids, seg, pos, cr, cc):
        return ctx.embed_packed(params, ids, seg, pos, cr, cc)

    q_dev = embed_only(params16, *p_args)
    _, idx_fast = mips.topk_single(
        q_dev, kb, ctx.k, chunk_size=min(ctx.n_kb, 262_144),
        compute_dtype=jnp.bfloat16, mode="fast")
    idx_fast = np.asarray(idx_fast)
    # exact selection over the SAME q_dev: comparing the fast path against
    # a different program's embeds would fold bf16 cross-program embedding
    # tie swaps into the selection-contract metric
    _, idx_exact_q = mips.topk_global(
        q_dev, kb, ctx.k, valid_rows=jnp.int32(ctx.n_kb),
        compute_dtype=jnp.bfloat16)
    r20_fast = r_at_20(idx_fast, np.asarray(idx_exact_q), ctx.n_queries)
    del idx_exact_q

    n_check = 16 if ctx.small else 64
    slice_rows = min(ctx.n_kb, 262_144)
    # jitted: an eager 12-layer forward over the tunnel is hundreds of
    # per-primitive remote dispatches (minutes inside the watchdog budget)
    fp32_fwd = jax.jit(lambda p, *a: dpr.apply_packed(
        p, cfg, *a, deterministic=True, compute_dtype=jnp.float32))
    q_fp32 = fp32_fwd(ctx.params_f32(), *p_args)[:n_check]
    kb_f32 = kb[:slice_rows].astype(jnp.float32)
    _, idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="fast")
    _, ref_idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="exact")
    overlap = r_at_20(np.asarray(idx), np.asarray(ref_idx), n_check)
    del kb_f32, q_fp32, q_dev, idx, ref_idx, kb
    gc.collect()
    return {
        "r_at_20_fast_vs_exact_fullkb": round(r20_fast, 4),
        "r_at_20_fp32_contract_262k_slice": round(overlap, 4),
    }


def stage_reader(ctx: Ctx):
    """Reader throughput vs the reference's headline number
    (MultiPassageBERT test: 2.505 samples/sec on 1xV100,
    experiments/rc/viquae/metrics.json) — bert-base reader, M=24 passages
    of seq 256 per question; padded AND packed variants."""
    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.models import bert, qa
    from viquae_tpu.ops import packing

    rng = np.random.default_rng(5)
    rcfg = qa.ReaderConfig(bert=bert.BertConfig(add_pooler=False))
    r_params = qa.init(jax.random.fold_in(ctx.key, 3), rcfg)
    m_passages, r_seq, n_q = 24, 256, 8 if ctx.small else 16
    r_ids = jnp.asarray(
        rng.integers(1000, 10_000, (n_q * m_passages, r_seq)), jnp.int32)
    r_mask = jnp.ones_like(r_ids)

    @jax.jit
    def reader_step(params, ids, mask):
        out = qa.reader_apply(
            params, rcfg, ids, attention_mask=mask,
            m_passages=m_passages, deterministic=True,
            compute_dtype=jnp.bfloat16)
        start_p = jnp.exp(jax.nn.log_softmax(out.start_logits, -1)
                          ).reshape(n_q, m_passages, r_seq)
        end_p = jnp.exp(jax.nn.log_softmax(out.end_logits, -1)
                        ).reshape(n_q, m_passages, r_seq)
        return qa.get_best_spans(start_p, end_p)

    out_r = reader_step(r_params, r_ids, r_mask)
    sync(out_r)
    t0 = time.time()
    for _ in range(ctx.reps):
        out_r = reader_step(r_params, r_ids, r_mask)
    sync(out_r)
    reader_sps = n_q / ((time.time() - t0) / ctx.reps)

    # PACKED reader: same model, (question, passage) pairs at their REAL
    # lengths — the reference's passages are exactly 100 tokenizer tokens
    # (meerqat/data/loading.py:274-306), so a pair is ~125 tokens, not 256;
    # many pairs share each canvas row (qa.reader_apply_packed,
    # parity-tested in tests/test_packing.py)
    pair_lens = np.clip(
        np.round(rng.lognormal(np.log(18.0), 0.35, n_q * m_passages)),
        8, 64).astype(int) + 100 + 3
    pair_seqs = [rng.integers(1000, 10_000, size=int(l)).astype(np.int32)
                 for l in pair_lens]
    rp = packing.pack_token_sequences(pair_seqs, row_len=r_seq,
                                      pad_rows_to=16)
    tt = packing.pack_parallel(
        rp, [np.r_[np.zeros(int(l) - 101, np.int32), np.ones(101, np.int32)]
             for l in pair_lens])
    g_idx, g_mask = packing.gather_indices(rp, r_seq)

    @jax.jit
    def reader_step_packed(params, ids, seg, pos, tt, g_idx, g_mask):
        out = qa.reader_apply_packed(
            params, rcfg, ids, seg, pos, tt, g_idx, g_mask,
            m_passages=m_passages, deterministic=True,
            compute_dtype=jnp.bfloat16)
        start_p = jnp.exp(jax.nn.log_softmax(out.start_logits, -1)
                          ).reshape(n_q, m_passages, r_seq)
        end_p = jnp.exp(jax.nn.log_softmax(out.end_logits, -1)
                        ).reshape(n_q, m_passages, r_seq)
        return qa.get_best_spans(start_p, end_p)

    rp_args = tuple(jnp.asarray(a) for a in (
        rp.input_ids, rp.segment_ids, rp.position_ids, tt, g_idx, g_mask))
    out_rp = reader_step_packed(r_params, *rp_args)
    sync(out_rp)
    t0 = time.time()
    for _ in range(ctx.reps):
        out_rp = reader_step_packed(r_params, *rp_args)
    sync(out_rp)
    reader_packed_sps = n_q / ((time.time() - t0) / ctx.reps)
    del out_r, out_rp, r_ids, r_mask, rp_args, r_params
    return {
        "reader_samples_per_sec": round(reader_sps, 2),
        "reader_vs_reference_v100": round(reader_sps / 2.505, 1),
        "reader_packed_samples_per_sec": round(reader_packed_sps, 2),
        "reader_packed_vs_reference_v100": round(
            reader_packed_sps / 2.505, 1),
        "reader_packed_canvas": f"{rp.rows}x{r_seq} density "
                                f"{packing.packing_efficiency(rp):.3f}",
    }


def stage_image_chain(ctx: Ctx):
    """MTCNN cascade + ArcFace + CLIP ViT-B/32 + ImageNet RN50 items/s
    (bf16 compute, params as jit ARGS — closures embed 100s of MB of
    weight constants in the HLO and blow the remote-compile payload cap).
    The reference embeds ~1M+ images + detects faces over 506k humans —
    meerqat/image/embedding.py:169-183, face_detection.py:87-139."""
    import functools

    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.models import arcface, clip as clip_lib, mtcnn
    from viquae_tpu.models import resnet as resnet_lib

    rng = np.random.default_rng(11)
    small = ctx.small
    out = {}

    def timeit(fn, *a, n_items, reps=3):
        o = fn(*a)
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(*a)
        sync(o)
        return n_items / ((time.time() - t0) / reps)

    side, n_img = 256, 8 if small else 16
    mcfg = mtcnn.MTCNNConfig(canvas=side, min_face_size=20)
    m_params = mtcnn.init(jax.random.fold_in(ctx.key, 20))
    images = jnp.asarray(
        rng.uniform(0, 255, (n_img, side, side, 3)).astype(np.float32))
    hws = jnp.asarray(np.full((n_img, 2), float(side), np.float32))
    out["mtcnn_images_per_s"] = round(timeit(
        jax.jit(functools.partial(mtcnn.detect_faces_batch, cfg=mcfg)),
        m_params, images, hws, n_items=n_img), 1)

    batch = 32 if small else 128
    acfg = arcface.ArcFaceConfig()
    a_params = arcface.init(jax.random.fold_in(ctx.key, 21), acfg)
    crops = jnp.asarray(
        rng.standard_normal((batch, 112, 112, 3)).astype(np.float32))
    out["arcface_faces_per_s"] = round(timeit(
        jax.jit(lambda p, x: arcface.apply(
            p, acfg, x, compute_dtype=jnp.bfloat16)),
        a_params, crops, n_items=batch), 1)

    vcfg = clip_lib.CLIPVisionConfig()
    v_params = clip_lib.vit_init(jax.random.fold_in(ctx.key, 22), vcfg)
    pixels = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    out["clip_vit_images_per_s"] = round(timeit(
        jax.jit(lambda p, x: clip_lib.vit_apply(
            p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"]),
        v_params, pixels, n_items=batch), 1)

    rcfg = resnet_lib.ResNetConfig()
    r_params = resnet_lib.init(jax.random.fold_in(ctx.key, 23), rcfg)
    out["resnet50_images_per_s"] = round(timeit(
        jax.jit(lambda p, x: resnet_lib.apply(
            p, rcfg, x, compute_dtype=jnp.bfloat16)),
        r_params, pixels, n_items=batch), 1)

    # corpus wall-clock estimate: 1M images through the slowest embed tower
    slowest = min(out["clip_vit_images_per_s"],
                  out["resnet50_images_per_s"])
    out["corpus_1m_embed_minutes_est"] = round(1e6 / slowest / 60, 1)
    out["faces_506k_detect_minutes_est"] = round(
        506_237 / out["mtcnn_images_per_s"] / 60, 1)
    return {"image_chain": out}


def stage_train(ctx: Ctx):
    """One timed packed train step each for the biencoder (questions/s)
    and the ECA multimodal tower (pairs/s) — mirrors scripts/
    exp_train_packed.py and exp_train_eca_packed.py protocols.
    Driver-tracked: a packing or remat regression in training must move
    the bench."""
    import functools

    import optax

    jax, jnp = ctx.jax, ctx.jnp
    from viquae_tpu.models import bert, dpr, mm
    from viquae_tpu.ops import packing
    from viquae_tpu.train import objectives

    rng = np.random.default_rng(12)
    small = ctx.small

    # ---- packed biencoder step (N=64 questions x M=2 passages) ----------
    N, M = 64, 2
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = {
        "question": dpr.init(jax.random.fold_in(ctx.key, 30), cfg),
        "context": dpr.init(jax.random.fold_in(ctx.key, 31), cfg),
    }
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    q_lens = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, N)),
                     8, 64).astype(int)
    c_lens = np.clip(np.round(rng.normal(125, 8, N * M)), 100, 160
                     ).astype(int)
    pq = packing.pack_token_sequences(
        [rng.integers(1000, 10000, l).astype(np.int32) for l in q_lens],
        row_len=64, pad_rows_to=8)
    pc = packing.pack_token_sequences(
        [rng.integers(1000, 10000, l).astype(np.int32) for l in c_lens],
        row_len=256, pad_rows_to=8)
    pq_args = tuple(jnp.asarray(a) for a in (
        pq.input_ids, pq.segment_ids, pq.position_ids, pq.cls_rows,
        pq.cls_cols))
    pc_args = tuple(jnp.asarray(a) for a in (
        pc.input_ids, pc.segment_ids, pc.position_ids, pc.cls_rows,
        pc.cls_cols))
    labels = jnp.asarray((np.arange(N) * M).astype(np.int32))

    @jax.jit
    def step_biencoder(params, opt_state, pq_args, pc_args, labels):
        def loss(p):
            q = dpr.apply_packed(p["question"], cfg, *pq_args,
                                 deterministic=True,
                                 compute_dtype=jnp.bfloat16)
            c = dpr.apply_packed(p["context"], cfg, *pc_args,
                                 deterministic=True,
                                 compute_dtype=jnp.bfloat16)
            return objectives.biencoder_loss(q, c, labels)[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    o = step_biencoder(params, opt_state, pq_args, pc_args, labels)
    sync(o[2])
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        o = step_biencoder(params, opt_state, pq_args, pc_args, labels)
    sync(o[2])
    biencoder_qps = N / ((time.time() - t0) / reps)
    del params, opt_state, o, pq_args, pc_args

    # ---- packed ECA step (MICT batch 512 pairs, per-layer remat) --------
    B, SEQ = 128 if small else 512, 256
    mcfg = mm.MMConfig(
        bert=bert.BertConfig(add_pooler=False),
        n_faces=4, face_dim=512, bbox_dim=7,
        image_dims=(("clip-RN50", 1024), ("imagenet-RN50", 2048)),
    )
    e_params = {
        "question": mm.eca_init(jax.random.fold_in(ctx.key, 32), mcfg),
        "context": mm.eca_init(jax.random.fold_in(ctx.key, 33), mcfg),
    }
    e_opt = tx.init(e_params)

    def mm_side(mu, sigma):
        lens = np.clip(
            np.round(rng.lognormal(np.log(mu), sigma, B)), 5, SEQ
        ).astype(int)
        ids = np.zeros((B, SEQ), np.int32)
        mask = np.zeros((B, SEQ), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(1000, 20_000, l)
            mask[i, :l] = 1
        face_mask = np.zeros((B, 1, 4), np.int32)
        for i in np.nonzero(rng.random(B) < 0.4)[0]:
            face_mask[i, 0, : rng.integers(1, 5)] = 1
        inputs = {
            "text_inputs": {"input_ids": ids, "attention_mask": mask},
            "face_inputs": {
                "face": rng.standard_normal((B, 1, 4, 512)
                                            ).astype(np.float32),
                "bbox": rng.standard_normal((B, 1, 4, 7)
                                            ).astype(np.float32),
                "attention_mask": face_mask,
            },
            "image_inputs": {
                "clip-RN50": {
                    "input": rng.standard_normal((B, 1, 1024)
                                                 ).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
                "imagenet-RN50": {
                    "input": rng.standard_normal((B, 1, 2048)
                                                 ).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
            },
        }
        from viquae_tpu.train.data import pack_mm_text_inputs

        t_vis = 4 + 2
        inputs["text_inputs"] = {
            **inputs["text_inputs"],
            **pack_mm_text_inputs(inputs, SEQ + t_vis),
        }
        return inputs

    batch = {
        "question_inputs": mm_side(18.0, 0.35),
        "context_inputs": mm_side(64.0, 0.30),
        "labels": np.arange(B, dtype=np.int32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    def enc(p, inputs):
        t = inputs["text_inputs"]
        return mm.eca_apply_packed(
            p, mcfg, t["canvas_input_ids"], t["canvas_segment_ids"],
            t["canvas_position_ids"], t["canvas_cls_rows"],
            t["canvas_cls_cols"], t["canvas_vis_rows"],
            t["canvas_vis_cols"], inputs["face_inputs"],
            inputs["image_inputs"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat_layers=True,
        )[:B]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_eca(params, opt_state, batch):
        def loss(p):
            q = enc(p["question"], batch["question_inputs"])
            c = enc(p["context"], batch["context_inputs"])
            return objectives.biencoder_loss(q, c, batch["labels"])[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    e_params, e_opt, l = step_eca(e_params, e_opt, batch)
    sync(l)
    t0 = time.time()
    for _ in range(reps):
        e_params, e_opt, l = step_eca(e_params, e_opt, batch)
    sync(l)
    eca_pps = B / ((time.time() - t0) / reps)
    del e_params, e_opt, batch
    return {
        "train_biencoder_qps": round(biencoder_qps, 1),
        "train_eca_pps": round(eca_pps, 1),
        "train_config": "packed canvases; biencoder 64qx2p bf16 sgd; "
                        "ECA MICT batch "
                        f"{128 if small else 512} pairs, per-layer remat",
    }


STAGES = [
    ("exact", stage_exact, STAGE_EST_S["exact"]),
    ("fusion", stage_fusion, STAGE_EST_S["fusion"]),
    ("hybrid", stage_hybrid, STAGE_EST_S["hybrid"]),
    ("parity", stage_parity, STAGE_EST_S["parity"]),
    ("reader", stage_reader, STAGE_EST_S["reader"]),
    ("image_chain", stage_image_chain, STAGE_EST_S["image_chain"]),
    ("train", stage_train, STAGE_EST_S["train"]),
]


def _drill_stages():
    """VIQUAE_BENCH_DRILL=1: tiny synthetic stages exercising the HARNESS
    (stage cache, exec retry, watchdog emission, kill survival) without
    bert-scale compute — tests/test_bench_robustness.py runs these; the
    real stages are exercised by the actual TPU bench run."""
    def d_exact(ctx):
        x = ctx.jnp.ones((8, 8))
        sync(ctx.jax.jit(lambda a: a @ a)(x))
        return {"exact_qps": 123.0, "drill": True}

    def d_hang(ctx):
        time.sleep(float(os.environ.get("VIQUAE_BENCH_DRILL_HANG", "120")))
        return {"hang_done": True}

    def d_fail(ctx):
        raise RuntimeError("drill stage failure (not OOM)")

    return [("exact", d_exact, 2), ("hang", d_hang, 2), ("fail", d_fail, 2)]


def _active_stages():
    stages = (_drill_stages() if os.environ.get("VIQUAE_BENCH_DRILL")
              else STAGES)
    only = os.environ.get("VIQUAE_BENCH_STAGES")
    if only:
        keep = set(only.split(","))
        stages = [s for s in stages if s[0] in keep]
    return stages


def _is_oom(err_repr: str) -> bool:
    return ("RESOURCE_EXHAUSTED" in err_repr or "ResourceExhausted"
            in err_repr or "Out of memory" in err_repr)


def _is_compiler_crash(err_repr: str) -> bool:
    """Remote-compile helper crash (HTTP 500 / INTERNAL): observed
    DETERMINISTIC for some full-batch programs (round 4: the Q=1280
    fusion program, 4/4) while the half-batch program compiles fine —
    degrade like an OOM instead of burning both attempts on a replay."""
    return ("remote_compile" in err_repr and "HTTP 500" in err_repr) or (
        "tpu_compile_helper" in err_repr)


def _reexec(extra_env: dict, drop: tuple = ()):
    """Fresh-process retry: exec replaces this process, so the exception
    traceback's multi-GB device buffers are freed, the PJRT client
    re-initializes, and the stage cache lets the child skip everything
    already done. The TOTAL deadline rides through the env. ``drop``
    removes keys (the recovery pass sheds the degrade flags)."""
    env = dict(os.environ, **extra_env)
    for key in drop:
        env.pop(key, None)
    env["VIQUAE_BENCH_DEADLINE"] = str(DEADLINE)
    sys.stderr.flush()
    sys.stdout.flush()
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def main():
    global _CACHE
    cache = StageCache()
    _CACHE = cache

    # wedged-window wait, requested by the previous exec's OOM handler:
    # sleep BEFORE the PJRT client initializes so the chip is not held
    # while waiting out co-tenant pressure
    wedge_sleep = os.environ.pop("VIQUAE_BENCH_SLEEP", None)
    if wedge_sleep:
        dt = min(float(wedge_sleep), max(0.0, time_left() - 180))
        print(f"bench: wedged window — sleeping {dt:.0f}s before retry "
              f"(t_left={time_left():.0f}s)", file=sys.stderr, flush=True)
        time.sleep(dt)

    import jax

    # persistent compilation cache: first-ever compile over the tunneled TPU
    # can take minutes; cached executables make reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # BENCH_PLATFORM=cpu: run the whole bench program flow on the virtual
    # CPU backend — a functional smoke of every stage (numbers meaningless)
    # for when the TPU tunnel is down; pairs with BENCH_SMALL=1
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # backend-init deadline: a tunnel outage makes jax.devices() itself hang
    # (observed 25 min before UNAVAILABLE on 2026-08-17) inside native PJRT
    # code where no python exception can interrupt — fail FAST (emitting
    # whatever the stage cache already holds) so the driver sees a result
    def _init_watchdog():
        print("bench: TPU backend init exceeded budget (tunnel down or "
              "hang-wedged)", file=sys.stderr, flush=True)
        # same rescue as a probe hang: retry in a fresh sleeping process
        # while wedge/deadline budget allows (observed 2026-08-20: the
        # wedge can hang jax.devices() itself), else emit and exit
        if (_CACHE is not None and _CACHE.wedge_waits() < MAX_WEDGE_WAITS
                and time_left() > 600 + 300):
            _CACHE.bump_wedge()
            sys.stderr.flush()
            sys.stdout.flush()
            env = dict(os.environ,
                       VIQUAE_BENCH_SLEEP=str(DEFER_WAIT_S),
                       VIQUAE_BENCH_DEADLINE=str(DEADLINE))
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)
        if _CACHE is not None and _CACHE.data["stages"]:
            emit(_CACHE, final=False, note="backend init timed out")
        os._exit(3)

    _init_timer = threading.Timer(
        max(60.0, min(600.0, time_left() - 90)), _init_watchdog)
    _init_timer.daemon = True
    _init_timer.start()
    jax.devices()
    _init_timer.cancel()
    import jax.numpy as jnp

    ctx = Ctx(jax, jnp)
    fake_oom = os.environ.get("VIQUAE_BENCH_FAKE_OOM")

    if RECOVER:
        _recovery_pass(cache, ctx)
        emit(cache, final=True)
        return

    queue = list(_active_stages())
    defers: dict = {}
    while queue:
        name, fn, est = queue.pop(0)
        if cache.done(name):
            continue
        if name in cache.data["errors"] and cache.attempts(name) >= 2:
            continue  # failed permanently in an earlier process
        if time_left() < est + FINAL_MARGIN_S:
            cache.put_error(name, "skipped: deadline")
            continue
        need_gb = STAGE_MIN_PROBE_GB.get(name)
        if need_gb and PROBE_ENABLED:
            free_gb = probe_free_hbm(jax, jnp)
            canary = host_canary_ms()
            cache.put_health(name, {"free_hbm_gb": free_gb,
                                    "canary_ms": round(canary, 1)})
            # a degraded run needs roughly half the headroom; still defer
            # when even that is missing (2026-08-20: a wedged window fails
            # EVERY size — degrading must not disable waiting it out)
            need_now = need_gb if not DEGRADED else max(
                WEDGE_GB, need_gb / 2)
            if free_gb < need_now:
                # dirty window: DEFER rather than degrade while deadline
                # headroom exists — co-tenant HBM pressure on this shared
                # chip comes and goes within minutes (round-4 lesson)
                n_defer = defers.get(name, 0)
                rest_est = sum(e for _, _, e in queue) + est
                if (n_defer < MAX_DEFERS
                        and time_left() > rest_est + DEFER_WAIT_S
                        + FINAL_MARGIN_S):
                    defers[name] = n_defer + 1
                    print(f"bench: stage {name} deferred (probe "
                          f"{free_gb}GB < {need_now}GB, defer "
                          f"{n_defer + 1}/{MAX_DEFERS})", file=sys.stderr,
                          flush=True)
                    # wait the window out; brief pause even when other
                    # stages remain (they are usually gated too — without
                    # a pause a fully-dirty window busy-probes)
                    time.sleep(DEFER_WAIT_S if not queue
                               else DEFER_WAIT_S / 6)
                    queue.append((name, fn, est))
                    continue
                print(f"bench: stage {name} proceeding despite dirty "
                      f"probe ({free_gb}GB)", file=sys.stderr, flush=True)
        try:
            if fake_oom == name and cache.attempts(name) == 0:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: injected fake OOM (drill)")
            print(f"bench: stage {name} "
                  f"(t_left={time_left():.0f}s)", file=sys.stderr,
                  flush=True)
            details = fn(ctx)
        except Exception as e:  # noqa: BLE001
            err = repr(e)
            oomish = _is_oom(err) or _is_compiler_crash(err)
            # WEDGED window: the stage's own pre-probe already read ~zero
            # free HBM, so this OOM carries no information about the
            # program — wait it out in a fresh process (attempt NOT
            # consumed, degrade ladder NOT escalated) while deadline
            # headroom exists. Probing here instead would be misled by
            # this very exception's still-referenced device buffers.
            pre_gb = cache.health(name).get("free_hbm_gb")
            rest_est = sum(e_ for _, _, e_ in queue) + est
            if (oomish and pre_gb is not None and pre_gb < WEDGE_GB
                    and cache.wedge_waits() < MAX_WEDGE_WAITS
                    and time_left() > rest_est + DEFER_WAIT_S
                    + FINAL_MARGIN_S):
                n = cache.bump_wedge()
                print(f"bench: stage {name} OOM in a wedged window "
                      f"(pre-probe {pre_gb}GB) — wedge wait "
                      f"{n}/{MAX_WEDGE_WAITS}", file=sys.stderr,
                      flush=True)
                emit(cache, final=False,
                     note=f"wedged window: waiting {DEFER_WAIT_S:.0f}s "
                          f"before retrying {name}")
                _reexec({"VIQUAE_BENCH_SLEEP": str(DEFER_WAIT_S)})
            attempts = cache.bump_attempts(name)
            print(f"bench: stage {name} attempt {attempts} failed: "
                  f"{err[:500]}", file=sys.stderr, flush=True)
            extra = {}
            if oomish:
                # escalating degrade ladder: free HBM on this shared chip
                # fluctuates; a lower but honest number beats no BENCH.
                # Compiler crashes degrade too — see _is_compiler_crash.
                # Level 1: half batch (628 queries). Level 2: + chunked
                # fused scoring (score buffer 1.9GB instead of 3.8 — a
                # measured 21% exact-qps toll, last resort only).
                if not DEGRADED:
                    extra["VIQUAE_BENCH_HALF"] = "1"
                elif not CHUNKED:
                    extra["VIQUAE_BENCH_HALF"] = "1"
                    extra["VIQUAE_BENCH_CHUNKED"] = "1"
            # an escalation is a NEW configuration — grant it an attempt
            # beyond the plain-replay budget of 2
            if (attempts < 2 or (extra.get("VIQUAE_BENCH_CHUNKED")
                                 and attempts < 3)) and time_left() > 240:
                emit(cache, final=False,
                     note=f"retrying stage {name} in a fresh process")
                _reexec(extra)  # never returns
            cache.put_error(name, err[:500])
            gc.collect()
            continue
        cache.put(name, details)
        emit(cache, final=False)

    # every stage has landed or permanently failed: spend remaining
    # deadline recovering at FULL batch (VERDICT r4 item 1b — the bench
    # must recover, not just survive). Recoverable: stages that landed
    # half-batch AND stages that errored out entirely (a wedged window
    # that cleared late must not leave permanent nulls). The recovery
    # runs in a fresh process with the degrade flags dropped so the OOM'd
    # parent's buffers and the half-batch ctx are gone.
    est_by_name = {n: e for n, _, e in _active_stages()}

    def _recoverable(n):
        if cache.recover_attempts(n) > 0:
            return False
        rec = cache.stage(n)
        if rec is not None:
            return bool(rec.get("half"))
        return n in cache.data["errors"]

    todo = [n for n in RECOVER_ORDER
            if n in est_by_name and _recoverable(n)]
    todo += [n for n in est_by_name
             if n not in RECOVER_ORDER and _recoverable(n)]
    min_est = min((est_by_name.get(n, 240) for n in todo),
                  default=0)
    if todo and time_left() > min_est + FINAL_MARGIN_S + 60:
        emit(cache, final=False,
             note=f"recovery pass: re-running {todo} at full batch")
        _reexec({"VIQUAE_BENCH_RECOVER": ",".join(todo)},
                drop=("VIQUAE_BENCH_HALF", "VIQUAE_BENCH_CHUNKED"))

    emit(cache, final=True)


def _recovery_pass(cache: StageCache, ctx: Ctx):
    """Re-run half-batch AND fully-errored stages at FULL batch, one
    attempt each, keeping whichever honest result exists: success
    replaces the degraded/errored record (recovered=True); any failure
    keeps it. Never re-enters the degrade ladder — a recovery OOM is
    final. A dirty probe WAITS (deadline permitting) rather than burning
    the stage's single recovery attempt."""
    import jax
    import jax.numpy as jnp

    by_name = {name: (fn, est) for name, fn, est in _active_stages()}
    for name in RECOVER:
        if name not in by_name or cache.recover_attempts(name) > 0:
            continue
        fn, est = by_name[name]
        if time_left() < est + FINAL_MARGIN_S:
            print(f"bench: recovery of {name} skipped (deadline)",
                  file=sys.stderr, flush=True)
            continue
        need_gb = STAGE_MIN_PROBE_GB.get(name)
        if need_gb and PROBE_ENABLED:
            while True:
                free_gb = probe_free_hbm(jax, jnp)
                cache.put_health(name, {"recover_free_hbm_gb": free_gb})
                if free_gb >= need_gb:
                    break
                if time_left() < est + DEFER_WAIT_S + FINAL_MARGIN_S:
                    break
                print(f"bench: recovery of {name} waiting out a "
                      f"squeezed window ({free_gb}GB)", file=sys.stderr,
                      flush=True)
                time.sleep(DEFER_WAIT_S)
            if free_gb < need_gb:
                print(f"bench: recovery of {name} skipped (window still "
                      f"squeezed: {free_gb}GB)", file=sys.stderr,
                      flush=True)
                continue
        cache.bump_recover(name)
        try:
            print(f"bench: recovery stage {name} at full batch "
                  f"(t_left={time_left():.0f}s)", file=sys.stderr,
                  flush=True)
            if os.environ.get("VIQUAE_BENCH_FAKE_OOM_RECOVER") == name:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: injected recovery OOM (drill)")
            details = fn(ctx)
        except Exception as e:  # noqa: BLE001
            print(f"bench: recovery of {name} failed (keeping the "
                  f"degraded/errored record): {repr(e)[:300]}",
                  file=sys.stderr, flush=True)
            gc.collect()
            continue
        cache.put(name, details, recovered=True)
        emit(cache, final=False)


if __name__ == "__main__":
    # the tunnel occasionally HANGS a dispatch outright (15+ min, zero
    # output, 0% CPU — CLAUDE.md round-2 notes). That hang blocks inside
    # the native PJRT client, where a SIGALRM python handler would never
    # run; a daemon watchdog THREAD emits the best-available result and
    # force-exits before the driver's external timeout loses everything.
    def _watchdog():
        print("bench watchdog: total deadline reached; emitting cached "
              "result", file=sys.stderr, flush=True)
        if _CACHE is not None:
            emit(_CACHE, final=False, note="deadline watchdog fired "
                 "mid-stage; result is the completed-stage subset")
            os._exit(0)
        os._exit(3)

    timer = threading.Timer(max(30.0, time_left() - 45), _watchdog)
    timer.daemon = True
    timer.start()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # a failure OUTSIDE any stage (backend init, imports): one
        # deadline-aware fresh-process retry, then emit what we have
        attempt = int(os.environ.get("VIQUAE_BENCH_RETRY", "0"))
        err = repr(e)
        print(f"bench: run-level failure (attempt {attempt}): {err[:500]}",
              file=sys.stderr, flush=True)
        if attempt < 2 and time_left() > 240:
            extra = {"VIQUAE_BENCH_RETRY": str(attempt + 1)}
            if _is_oom(err):
                extra["VIQUAE_BENCH_HALF"] = "1"
            _reexec(extra)
        if _CACHE is not None:
            emit(_CACHE, final=False, note=f"run-level failure: {err[:200]}")
        else:
            sys.exit(1)
    timer.cancel()
