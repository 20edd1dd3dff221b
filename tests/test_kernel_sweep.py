"""Seeded randomized contract sweep over the Pallas attention kernels
(round-5 VERDICT item 5).

Round 4 found four silent-wrong-answer kernel bugs by REVIEW, not by the
suite — kv_valid dropped when an additive mask was also passed, forced
packed+poincare computing oblique, a uniform -100 mask returning zero rows,
and c=0.025 outputs 26x too small. All four live in the contract space
{route x shape x mask-form x metric x scale}, which the example-based tests
under-sampled. This module draws a deterministic pseudo-random sample of that
space and asserts every forced kernel route matches the dense jnp oracle
(`geodesic_attention(fused=False)`) in forward AND input gradients, in
interpret mode on the CPU suite.

Structure bounds runtime: cases are grouped into a fixed pool of compiled
program shapes (route, shape, mask form, metric, compat), and each program is
exercised with several independent VALUE draws (scales, mask values, validity
patterns) that reuse the jit cache. Override the per-program draw count with
STTODE_SWEEP_DRAWS (default 3).

Contract defended: kernels/mhgsa.py MASK CONTRACT (fused_geodesic_attention
docstring), kernels/packed_mhgsa.py scope note, nn/attention._kernel_route
forced-route guards.
"""

import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sttode_tpu.nn.attention import geodesic_attention

SEED = 20260819
DRAWS = int(os.environ.get("STTODE_SWEEP_DRAWS", "3"))
SENTINEL = -1e30

# (lead_dims, L, S, Dh) — deliberately tile-unaligned sizes among them
SHAPES = [
    ((2,), 8, 8, 8),
    ((1,), 7, 13, 5),
    ((3, 2), 16, 16, 8),
    ((1,), 24, 9, 16),
    ((2,), 5, 33, 8),
    ((1,), 33, 17, 4),
]
# (B, H, L, S, Dh) with H*Dh <= 128 — the packed kernel's design space
PACKED_SHAPES = [
    (2, 8, 8, 8, 8),
    (1, 4, 11, 11, 8),
    (2, 2, 16, 16, 16),
    (1, 8, 5, 9, 8),
    (1, 8, 31, 17, 8),
]
METRICS = [("oblique", 1.0), ("poincare", 1.0), ("poincare", 0.05),
           ("poincare", 2.0)]
# mask forms: none | finite additive (incl. uniform shifts and positive
# bias) | sentinel exclusions | kv_valid | additive + kv_valid together
MASK_FORMS = ("none", "finite", "sentinel", "kv", "both")


def _draw_inputs(rng, lead, L, S, Dh, scale):
    q = jnp.asarray(rng.standard_normal((*lead, L, Dh)) * scale, jnp.float32)
    k = jnp.asarray(rng.standard_normal((*lead, S, Dh)) * scale, jnp.float32)
    v = jnp.asarray(rng.standard_normal((*lead, S, Dh)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((*lead, L, Dh)), jnp.float32)
    return q, k, v, ct


def _draw_mask(rng, form, lead, L, S):
    """Returns (mask, kv_valid); every query row keeps >= 1 attendable key
    (the all-excluded row's 0-output contract is kernel-specific and covered
    by the example tests — the dense oracle has no defined value there)."""
    mask = kv = None
    if form in ("finite",):
        kind = rng.integers(3)
        if kind == 0:                       # uniform shift (round-4 bug 3)
            mask = jnp.full((*lead, L, S), float(rng.choice([-100.0, 25.0])))
        elif kind == 1:                     # random signed biases
            mask = jnp.asarray(rng.standard_normal((*lead, L, S)) * 5.0,
                               jnp.float32)
        else:                               # large finite penalties
            m = rng.choice([0.0, -80.0], size=(*lead, L, S), p=[0.5, 0.5])
            m[..., 0] = 0.0                 # keep one un-penalized key
            mask = jnp.asarray(m, jnp.float32)
    elif form in ("sentinel", "both"):
        m = rng.choice([0.0, SENTINEL], size=(*lead, L, S), p=[0.6, 0.4])
        m[..., 0] = 0.0                     # >= 1 attendable key per row
        mask = jnp.asarray(m, jnp.float32)
    if form in ("kv", "both"):
        # kv_valid carries NO head axis (heads share key validity — the
        # packed/flash kernels broadcast it): batch dims only
        kv_lead = lead[:1] if len(lead) > 1 else lead
        val = rng.integers(0, 2, size=(*kv_lead, S)).astype(np.float32)
        val[..., 0] = 1.0                   # >= 1 valid key
        kv = jnp.asarray(val)
    return mask, kv


def _run(route, q, k, v, ct, mask, kv, metric, curvature, compat):
    def f(q, k, v):
        out, _ = geodesic_attention(q, k, v, mask=mask, kv_valid=kv,
                                    compat=compat, fused=route,
                                    need_weights=False, metric=metric,
                                    curvature=curvature)
        return jnp.sum(out * ct), out

    (_, out), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                         has_aux=True)(q, k, v)
    return out, grads


def _case_id(c):
    return (f"{c['route']}-{c['shape']}-{c['mask_form']}-{c['metric']}"
            f"-c{c['curvature']}-{c['compat']}")


def _build_cases():
    """The deterministic program pool: route x shape x mask form x metric x
    compat combinations drawn by a seeded rng (a sample, not the cross
    product — the full product would compile for minutes)."""
    rng = np.random.default_rng(SEED)
    cases = []
    # fused: the widest contract — all mask forms, both metrics, both compats
    for i in range(10):
        lead, L, S, Dh = SHAPES[rng.integers(len(SHAPES))]
        metric, c = METRICS[rng.integers(len(METRICS))]
        cases.append(dict(route=True, shape=(lead, L, S, Dh),
                          mask_form=MASK_FORMS[rng.integers(len(MASK_FORMS))],
                          metric=metric, curvature=c,
                          compat=str(rng.choice(["reference", "tpu"]))))
    # flash: kv_valid-only masks; reference-compat square would re-express
    # kv as an additive mask (Q3 swap) and correctly raise, so those draws
    # pin compat="tpu"
    for i in range(6):
        lead, L, S, Dh = SHAPES[rng.integers(len(SHAPES))]
        metric, c = METRICS[rng.integers(len(METRICS))]
        form = str(rng.choice(["none", "kv"]))
        compat = str(rng.choice(["reference", "tpu"]))
        if form == "kv" and L == S:
            compat = "tpu"
        cases.append(dict(route="flash", shape=(lead, L, S, Dh),
                          mask_form=form, metric=metric, curvature=c,
                          compat=compat))
    # packed: oblique only, explicit head axis, kv_valid-only
    for i in range(6):
        B, H, L, S, Dh = PACKED_SHAPES[rng.integers(len(PACKED_SHAPES))]
        form = str(rng.choice(["none", "kv"]))
        compat = str(rng.choice(["reference", "tpu"]))
        if form == "kv" and L == S:
            compat = "tpu"
        cases.append(dict(route="packed", shape=((B, H), L, S, Dh),
                          mask_form=form, metric="oblique", curvature=1.0,
                          compat=compat))
    return cases


CASES = _build_cases()


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_forced_route_matches_dense_oracle(case):
    lead, L, S, Dh = case["shape"]
    # zlib.crc32, not hash(): str hashes are salted per interpreter, and a
    # seeded sweep must replay identically across runs
    rng = np.random.default_rng(zlib.crc32(_case_id(case).encode()))
    for draw in range(DRAWS):
        # poincaré draws bound the geometry so tanh(√c‖x‖) ≤ ~0.95: at the
        # ball-boundary clamp, artanh's conditioning legitimately amplifies
        # fp32 rounding past any sharp tolerance (measured: dense-vs-kernel
        # diffs of 1e-3..1e-1 near saturation, BOTH paths correct to their
        # own rounding — e.g. c=2, Dh=8, unit-scale normals already
        # saturate). A normal draw has ‖x‖ ≈ scale·√Dh, so cap
        # scale ≤ atanh(0.95)/√(c·Dh); the boundary-clamp regime itself is
        # covered by the example tests. Oblique keeps the full range — row
        # normalization makes its scores scale-invariant in value.
        if case["metric"] == "poincare":
            cap = 1.5 / (case["curvature"] * case["shape"][3]) ** 0.5
            scales = [0.3 * cap, cap]
        else:
            scales = [0.3, 1.0, 3.0]
        scale = float(rng.choice(scales))
        q, k, v, ct = _draw_inputs(rng, lead, L, S, Dh, scale)
        mask, kv = _draw_mask(rng, case["mask_form"], lead, L, S)
        out_k, g_k = _run(case["route"], q, k, v, ct, mask, kv,
                          case["metric"], case["curvature"], case["compat"])
        out_d, g_d = _run(False, q, k, v, ct, mask, kv,
                          case["metric"], case["curvature"], case["compat"])
        msg = f"{_case_id(case)} draw={draw} scale={scale}"
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_d),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"fwd {msg}")
        for name, a, b in zip("qkv", g_k, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-3,
                                       err_msg=f"d{name} {msg}")


# --------------------------------------------------------------------------- #
# selection-decode kernel family (kernels/select_decode.py)                    #
# --------------------------------------------------------------------------- #

SD_CASES = []


def _build_sd_cases():
    """Seeded sample of the selection-decode contract space: horizons x
    scene count x K x mode x dtype x tiling. Same philosophy as the
    attention sweep — round 4's silent-wrong-answer class (k_block grid
    truncation, ~2x scene padding, bf16 selection noise) lives here."""
    rng = np.random.default_rng(SEED + 1)
    horizons = [(5, 10), (8, 12), (6, 7)]
    for i in range(10):
        tp, tf = horizons[rng.integers(len(horizons))]
        K = int(rng.choice([4, 8, 20]))
        SD_CASES.append(dict(
            tp=tp, tf=tf,
            M=int(rng.choice([3, 7, 13, 33])),
            K=K,
            mode=str(rng.choice(["dist", "traj"])),
            dtype=str(rng.choice(["float32", "bfloat16"])),
            k_block=int(rng.choice([b for b in (1, 2, 4) if K % b == 0])),
            m_tile=[None, 16][int(rng.integers(2))],
        ))


_build_sd_cases()


def _sd_id(c):
    return (f"T{c['tp']}-{c['tf']}-M{c['M']}-K{c['K']}-{c['mode']}"
            f"-{c['dtype']}-kb{c['k_block']}-mt{c['m_tile']}")


@pytest.mark.parametrize("case", SD_CASES, ids=_sd_id)
def test_select_decode_matches_decode_oracle(case):
    from sttode_tpu.kernels import select_decode as sd
    from sttode_tpu.models import STTODEConfig, sttode_init
    from sttode_tpu.models import sttode as m

    cfg = STTODEConfig(past_length=case["tp"],
                       future_length=case["tf"]).validate()
    params = sttode_init(jax.random.PRNGKey(0), cfg)
    M, K = case["M"], case["K"]
    rng = np.random.default_rng(zlib.crc32(_sd_id(case).encode()))

    pf1 = jnp.asarray(rng.standard_normal((M, 2 * cfg.hidden_dim)),
                      jnp.float32)
    z = jnp.asarray(rng.standard_normal((M * K, cfg.zdim)), jnp.float32)
    past = jnp.asarray(rng.standard_normal((M, cfg.past_length, 2)),
                       jnp.float32)
    cur = jnp.asarray(rng.standard_normal((M, 1, 2)), jnp.float32)
    fut = jnp.asarray(rng.standard_normal((M, cfg.future_length, 2)),
                      jnp.float32)
    state0 = m.decode_block0_state(params, past)

    z_km = jnp.transpose(z.reshape(M, K, -1), (1, 0, 2))
    got = sd.select_decode(
        params, pf1, z_km, state0, past.reshape(M, -1),
        (fut - cur).reshape(M, -1), mode=case["mode"],
        dtype=jnp.bfloat16 if case["dtype"] == "bfloat16" else jnp.float32,
        k_block=case["k_block"], m_tile=case["m_tile"], interpret=True)

    pf = jnp.repeat(pf1, K, axis=0)
    out_seq, _ = m.decode(params, cfg, pf, z, past, cur, K,
                          block0_state=state0)
    if case["mode"] == "traj":
        got_abs = jnp.transpose(got, (1, 0, 2)).reshape(
            M * K, cfg.future_length, 2) + jnp.repeat(cur, K, axis=0)
        if case["dtype"] == "float32":
            np.testing.assert_allclose(np.asarray(got_abs),
                                       np.asarray(out_seq),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=_sd_id(case))
        else:
            np.testing.assert_allclose(np.asarray(got_abs),
                                       np.asarray(out_seq),
                                       rtol=0.1, atol=0.3,
                                       err_msg=_sd_id(case))
        return
    want = jnp.sum(jnp.square(jnp.repeat(fut, K, axis=0) - out_seq),
                   axis=(-1, -2)).reshape(M, K)
    if case["dtype"] == "float32":
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=_sd_id(case))
    else:
        # bf16 selection contract: distances close, winner agreement up to
        # near-ties (models/sttode.py select_dtype docs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.08, atol=0.3, err_msg=_sd_id(case))
        gk, wk = np.asarray(got), np.asarray(want)
        w_at_g = wk[np.arange(M), gk.argmin(1)]
        w_best = wk[np.arange(M), wk.argmin(1)]
        assert np.all(w_at_g <= w_best * 1.05 + 0.05), _sd_id(case)


# --------------------------------------------------------------------------- #
# sequence-parallel attention family (parallel/ring_attention, ulysses)        #
# --------------------------------------------------------------------------- #

SP_CASES = []


def _build_sp_cases():
    """Seeded sample over the SP contract space on the 8-device CPU mesh:
    impl x (L, S, Dh divisible over the axis) x metric x kv pattern x grad
    target — the randomized counterpart of the fixed-shape equality tests
    in test_ring_attention.py / test_ulysses.py."""
    rng = np.random.default_rng(SEED + 2)
    for i in range(8):
        impl = ("ring", "ulysses")[i % 2]
        metric, c = METRICS[rng.integers(len(METRICS))]
        SP_CASES.append(dict(
            impl=impl,
            B=int(rng.choice([1, 2, 3])),
            H=int(rng.choice([4, 8])),           # ulysses only
            L=int(rng.choice([8, 16, 24])),
            S=int(rng.choice([8, 24, 32])),
            Dh=int(rng.choice([4, 8, 16])),
            metric=metric, curvature=c,
            kv=bool(rng.integers(2)),
        ))


_build_sp_cases()


def _sp_id(c):
    return (f"{c['impl']}-B{c['B']}H{c['H']}L{c['L']}S{c['S']}D{c['Dh']}"
            f"-{c['metric']}-c{c['curvature']}-kv{c['kv']}")


@pytest.mark.parametrize("case", SP_CASES, ids=_sp_id)
def test_sp_matches_dense_oracle(case):
    from sttode_tpu.parallel import make_mesh
    from sttode_tpu.parallel.ring_attention import (dense_reference,
                                                    ring_geodesic_attention)
    from sttode_tpu.parallel.ulysses import ulysses_geodesic_attention

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    mesh = make_mesh(dp=4, tp=1)     # SP axis size 4: 8/16/24/32 all divide
    rng = np.random.default_rng(zlib.crc32(_sp_id(case).encode()))
    B, H, L, S, Dh = (case[k] for k in ("B", "H", "L", "S", "Dh"))
    if case["metric"] == "poincare":
        scale = 1.5 / (case["curvature"] * Dh) ** 0.5   # see attention sweep
    else:
        scale = float(rng.choice([0.5, 1.5]))
    lead = (B, H) if case["impl"] == "ulysses" else (B,)
    q = jnp.asarray(rng.standard_normal((*lead, L, Dh)) * scale, jnp.float32)
    k = jnp.asarray(rng.standard_normal((*lead, S, Dh)) * scale, jnp.float32)
    v = jnp.asarray(rng.standard_normal((*lead, S, Dh)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((*lead, L, Dh)), jnp.float32)
    val = None
    if case["kv"]:
        a = rng.integers(0, 2, size=(B, S)).astype(np.float32)
        a[:, 0] = 1.0
        val = jnp.asarray(a)

    mk = case["metric"]
    cv = case["curvature"]
    if case["impl"] == "ring":
        sp_fn = lambda q, k, v: ring_geodesic_attention(
            q, k, v, mesh, kv_valid=val, metric=mk, curvature=cv)

        def dense_fn(q, k, v):
            return dense_reference(q, k, v, kv_valid=val, metric=mk,
                                   curvature=cv)
    else:
        sp_fn = lambda q, k, v: ulysses_geodesic_attention(
            q, k, v, mesh, kv_valid=val, metric=mk, curvature=cv)
        # dense_reference is 3-D [rows, tokens, Dh]: fold (B, H) into rows
        # and repeat kv_valid per head
        dval = None if val is None else jnp.repeat(val, H, axis=0)

        def dense_fn(q, k, v):
            out = dense_reference(q.reshape(B * H, L, Dh),
                                  k.reshape(B * H, S, Dh),
                                  v.reshape(B * H, S, Dh),
                                  kv_valid=dval, metric=mk, curvature=cv)
            return out.reshape(B, H, L, Dh)

    def f(fn):
        def loss(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(out * ct), out
        return jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
            q, k, v)

    (_, out_sp), g_sp = f(sp_fn)
    (_, out_d), g_d = f(dense_fn)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_d),
                               atol=1e-4, rtol=1e-3, err_msg=_sp_id(case))
    for name, a, b in zip("qkv", g_sp, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=f"d{name} {_sp_id(case)}")
