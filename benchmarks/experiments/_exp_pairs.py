"""Per-phase timing of the pair-expansion traversal on the real chip.

Times expand / sort+gather / pairtest / fallback independently on
camera rays and on synthetic incoherent bounce rays for the mesh scene,
and reports the resolved fraction (fallback load).

Run on TPU: python benchmarks/experiments/_exp_pairs.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tputracer.accel import pairs_tpu as P
from tputracer.accel.clustered import _sphere_best
from tputracer.accel.traverse_tpu import _traverse_pallas
from tputracer.config import RenderConfig
from tputracer.integrators.pt import camera_rays
from tputracer.rng import uniform3, salt
from tputracer.scene import mesh_scene

_BIG = 3.0e38


def timed(f, *a):
    jax.block_until_ready(f(*a))
    np.asarray(jax.tree.leaves(f(*a))[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


REPS = 8


def chain(f, pert_arg=0):
    """Call f REPS times inside one jit, perturbing one float arg so XLA
    cannot CSE the calls; amortizes the ~25-30 ms axon dispatch latency
    (round-3 protocol).  Returns per-call seconds."""

    @jax.jit
    def g(*a):
        outs = []
        for i in range(REPS):
            aa = list(a)
            aa[pert_arg] = aa[pert_arg] + jnp.float32(i) * 1e-7
            outs.append(f(*aa))
        return jax.tree.map(lambda *x: sum(jnp.sum(v if v.dtype != bool
                                                   else v.astype(jnp.float32))
                                           for v in x), *outs)

    def timed_chain(*a):
        dt_one = timed(f, *a)
        dt_chain = timed(g, *a)
        # device time per call ~ (chain - 1 dispatch) / REPS; report the
        # marginal per-call cost
        return (dt_chain - dt_one) / (REPS - 1)

    return timed_chain


scene = mesh_scene(subdiv=6)
sc = scene
cfg = RenderConfig(width=256, height=256, spp=1, max_bounces=8)
n = 65536
uid = jnp.arange(n, dtype=jnp.uint32)
o_cam, d_cam = camera_rays(scene, uid, cfg)

# synthetic incoherent bounce rays: origins on the blob-ish shell,
# random directions; ~30% dead lanes scattered (bounce-3-like)
u0, u1, u2 = uniform3(uid, salt(1, 7), 0)
r0, r1, r2 = uniform3(uid, salt(2, 9), 0)
phi = u0 * (2 * np.pi)
ct = u1 * 2.0 - 1.0
st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
o_b = jnp.stack([1.3 * st * jnp.cos(phi), 1.0 + 1.3 * ct,
                 1.3 * st * jnp.sin(phi)], axis=1)
phi2 = r0 * (2 * np.pi)
ct2 = r1 * 2.0 - 1.0
st2 = jnp.sqrt(jnp.maximum(1.0 - ct2 * ct2, 0.0))
d_b = jnp.stack([st2 * jnp.cos(phi2), ct2, st2 * jnp.sin(phi2)], axis=1)
alive = r2 > 0.3

C = sc.n_clusters
cmin, cmax = sc.clus_min.T, sc.clus_max.T
v0, e1, e2 = sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T
mask = sc.tri_mask[None, :]
K = P.K


@jax.jit
def expand(o, d, tmin, tmax):
    return P._expand_pallas(o, d, tmin, tmax, cmin, cmax)


@jax.jit
def sortgather(o, d, tmin, cid, tek, bt0):
    npair = n * K
    flat_cid = cid.reshape(npair)
    key = jnp.where(flat_cid >= 0, flat_cid, jnp.int32(C + 1))
    _, sidx = lax.sort((key, jnp.arange(npair, dtype=jnp.int32)),
                       num_keys=1)
    ray = sidx // K
    return (o[ray], d[ray], tmin[ray], flat_cid[sidx],
            tek.reshape(npair)[sidx], bt0[ray], sidx)


@jax.jit
def pairtest(po, pd, ptmin, pcid, pte, pbt):
    return P._pairtest_pallas(po, pd, ptmin, pcid, pte, pbt,
                              v0, e1, e2, mask, leaf=sc.leaf_size,
                              n_clusters=C)


@jax.jit
def resolve(pt_, pp_, sidx, bt0, bp0, bound, tmax):
    npair = n * K
    t_slots = jnp.zeros((npair,), jnp.float32).at[sidx].set(pt_)
    p_slots = jnp.zeros((npair,), jnp.int32).at[sidx].set(pp_)
    t_slots = t_slots.reshape(n, K)
    p_slots = p_slots.reshape(n, K)
    best_t, best_p = bt0, bp0
    for k in range(K):
        imp = t_slots[:, k] < best_t
        best_t = jnp.where(imp, t_slots[:, k], best_t)
        best_p = jnp.where(imp, p_slots[:, k], best_p)
    return best_t, best_p, best_t <= bound


@jax.jit
def fallback(o, d, tmin, tmax, resolved, best_t, best_p):
    fkey = resolved.astype(jnp.int32)
    _, fidx = lax.sort((fkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    ftmax = jnp.where(resolved, 0.0, tmax)[fidx]
    ft, fp = _traverse_pallas(
        o[fidx], d[fidx], tmin[fidx], ftmax, best_t[fidx], best_p[fidx],
        cmin, cmax, v0, e1, e2, mask, leaf=sc.leaf_size)
    t = jnp.zeros((n,), jnp.float32).at[fidx].set(ft)
    prim = jnp.zeros((n,), jnp.int32).at[fidx].set(fp)
    return t, prim


@jax.jit
def union_walk(o, d, tmin, tmax, bt0, bp0):
    return _traverse_pallas(o, d, tmin, tmax, bt0, bp0,
                            cmin, cmax, v0, e1, e2, mask,
                            leaf=sc.leaf_size)


for name, o, d, tmax in (
        ("camera", o_cam, d_cam, jnp.full((n,), _BIG)),
        ("bounce", o_b, d_b, jnp.where(alive, _BIG, 0.0))):
    tmin = jnp.zeros((n,))
    bt0, bp0 = _sphere_best(sc, o, d, tmin, tmax)
    bt0 = jnp.minimum(bt0, tmax)
    t_ex = chain(expand)(o, d, tmin, tmax)
    cid, tek, bound = expand(o, d, tmin, tmax)
    # perturb cid by a roll so the 8 chained sorts cannot be CSE'd
    @jax.jit
    def sg_chain(o, d, tmin, cid, tek, bt0):
        outs = []
        for i in range(REPS):
            outs.append(sortgather(o, d, tmin,
                                   jnp.roll(cid, i, axis=0), tek, bt0))
        return jax.tree.map(
            lambda *x: sum(jnp.sum(v.astype(jnp.float32)) for v in x),
            *outs)

    dt1 = timed(sortgather, o, d, tmin, cid, tek, bt0)
    dt8 = timed(sg_chain, o, d, tmin, cid, tek, bt0)
    t_sg = (dt8 - dt1) / (REPS - 1)
    po, pd, ptmin, pcid, pte, pbt, sidx = sortgather(o, d, tmin, cid, tek,
                                                     bt0)
    t_pt = chain(pairtest)(po, pd, ptmin, pcid, pte, pbt)
    pt_, pp_ = pairtest(po, pd, ptmin, pcid, pte, pbt)
    t_rs = chain(resolve, 0)(pt_, pp_, sidx, bt0, bp0, bound, tmax)
    best_t, best_p, resolved = resolve(pt_, pp_, sidx, bt0, bp0, bound,
                                       tmax)
    t_fb = chain(fallback)(o, d, tmin, tmax, resolved, best_t, best_p)
    t_uw = chain(union_walk)(o, d, tmin, tmax, bt0, bp0)
    live = np.asarray(tmax) > 0
    res = np.asarray(resolved)
    livepairs = int((np.asarray(pcid) >= 0).sum())
    print(f"{name}: live={live.sum()}/{n} live_pairs={livepairs} "
          f"resolved={res[live].mean():.1%}")
    print(f"  expand {t_ex*1e3:7.3f} ms | sort+gather {t_sg*1e3:7.3f} | "
          f"pairtest {t_pt*1e3:7.3f} | resolve {t_rs*1e3:7.3f} | "
          f"fallback {t_fb*1e3:7.3f} || total "
          f"{(t_ex+t_sg+t_pt+t_rs+t_fb)*1e3:7.3f} vs union-walk "
          f"{t_uw*1e3:7.3f}")
