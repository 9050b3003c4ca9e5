"""Instrumented copy of the traversal kernel: outputs per-tile trip counts."""
import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tputracer.scene import mesh_scene
from tputracer.integrators.pt import camera_rays
from tputracer.config import RenderConfig
from tputracer.accel.clustered import _sphere_best

TILE = 64
def _kern(o_ref, d_ref, tmin_ref, tmax_ref, bt0_ref, bp0_ref,
          cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref, mask_ref,
          bt_out, bp_out, k_out, te_scr, score_scr, *, leaf, refresh):
    BIG = 3.0e38
    C = cmin_ref.shape[1]
    tmin = tmin_ref[:]; tmax = tmax_ref[:]
    tn = jnp.full((TILE, C), -BIG); tf = jnp.full((TILE, C), BIG)
    for a in range(3):
        da = d_ref[:, a:a+1]
        tiny = jnp.float32(1e-12)
        inv = 1.0/jnp.where(jnp.abs(da) < tiny, jnp.where(da >= 0.0, tiny, -tiny), da)
        t0 = (cmin_ref[a:a+1,:]-o_ref[:,a:a+1])*inv
        t1 = (cmax_ref[a:a+1,:]-o_ref[:,a:a+1])*inv
        tn = jnp.maximum(tn, jnp.minimum(t0,t1)); tf = jnp.minimum(tf, jnp.maximum(t0,t1))
    hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
    te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)
    bt_out[:] = bt0_ref[:]; bp_out[:] = bp0_ref[:]
    iota_c = lax.broadcasted_iota(jnp.int32, (1, C), 1)
    def fresh():
        adm = jnp.where((te_scr[:] < bt_out[:]) & (score_scr[:] < BIG), te_scr[:], BIG)
        score_scr[:] = jnp.min(adm, axis=0, keepdims=True)
    score_scr[:] = jnp.full((1, C), 0.0); fresh()
    def pick():
        row = score_scr[:]
        return (jnp.argmin(row[0]).astype(jnp.int32), jnp.min(row))
    def body(state):
        k, c, _ = state
        score_scr[:] = jnp.where(iota_c == c, BIG, score_scr[:])
        bt = bt_out[:]; bp = bp_out[:]
        sl = pl.ds(pl.multiple_of(c*leaf, 128), leaf)
        v0x,v0y,v0z = (v0_ref[a:a+1, sl] for a in range(3))
        e1x,e1y,e1z = (e1_ref[a:a+1, sl] for a in range(3))
        e2x,e2y,e2z = (e2_ref[a:a+1, sl] for a in range(3))
        msk = mask_ref[0:1, sl]
        ox,oy,oz = (o_ref[:,a:a+1] for a in range(3))
        dx,dy,dz = (d_ref[:,a:a+1] for a in range(3))
        px = dy*e2z - dz*e2y; py = dz*e2x - dx*e2z; pz = dx*e2y - dy*e2x
        det = e1x*px + e1y*py + e1z*pz
        ok = jnp.abs(det) > 1e-12
        f = 1.0/jnp.where(ok, det, 1.0)
        sx,sy,sz = ox-v0x, oy-v0y, oz-v0z
        u = f*(sx*px + sy*py + sz*pz)
        qx = sy*e1z - sz*e1y; qy = sz*e1x - sx*e1z; qz = sx*e1y - sy*e1x
        v = f*(dx*qx + dy*qy + dz*qz)
        t = f*(e2x*qx + e2y*qy + e2z*qz)
        ok = (ok & (u >= 0.0) & (v >= 0.0) & (u+v <= 1.0) & (t > tmin) & (t < bt) & (msk > 0.0))
        tblk = jnp.where(ok, t, BIG)
        th = jnp.min(tblk, axis=1, keepdims=True)
        j = jnp.argmin(tblk, axis=1).astype(jnp.int32)[:, None]
        imp = th < bt
        bt_out[:] = jnp.where(imp, th, bt)
        bp_out[:] = jnp.where(imp, c*leaf+j, bp)
        k = k + 1
        @pl.when(k % refresh == 0)
        def _():
            fresh()
        nc, nv = pick()
        return k, nc, nv
    c0, v0_ = pick()
    kf, _, _ = lax.while_loop(lambda s: s[2] < BIG, body, (jnp.int32(0), c0, v0_))
    k_out[:] = jnp.full((TILE, 1), kf)

@functools.partial(jax.jit, static_argnames=("leaf", "refresh"))
def run(o, d, tmin, tmax, bt0, bp0, cmin, cmax, v0, e1, e2, mask, *, leaf, refresh):
    n = o.shape[0]
    grid = (n // TILE,)
    ray2 = lambda w: pl.BlockSpec((TILE, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,)*a.ndim, memory_space=pltpu.VMEM)
    C = cmin.shape[1]
    return pl.pallas_call(
        functools.partial(_kern, leaf=leaf, refresh=refresh),
        grid=grid,
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1), ray2(1), ray2(1),
                  full(cmin), full(cmax), full(v0), full(e1), full(e2), full(mask)],
        out_specs=[ray2(1), ray2(1),
                   ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n,1), jnp.float32),
                   jax.ShapeDtypeStruct((n,1), jnp.int32),
                   jax.ShapeDtypeStruct((n,1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32), pltpu.VMEM((1, C), jnp.float32)],
    )(o, d, tmin, tmax, bt0, bp0, cmin, cmax, v0, e1, e2, mask)

scene = mesh_scene(subdiv=6)
N = 1 << 16
cfg = RenderConfig(width=256, height=256, spp=1, max_bounces=1)
uid = jnp.arange(N, dtype=jnp.uint32)
o_c, d_c = jax.jit(lambda u: camera_rays(scene, u, cfg))(uid)
rng = np.random.default_rng(0)
lo, hi = np.array([-2,0,-2]), np.array([2,3,2])
o_i = jnp.asarray(rng.uniform(lo, hi, (N,3)).astype(np.float32))
dd = rng.normal(size=(N,3)).astype(np.float32)
d_i = jnp.asarray(dd/np.linalg.norm(dd,axis=1,keepdims=True))

sc = scene
args_sc = (sc.clus_min.T, sc.clus_max.T, sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None,:])
tmin = jnp.zeros((N,), jnp.float32)[:, None]
tmax = jnp.full((N,), 3e38, jnp.float32)[:, None]
bp0 = jnp.full((N,1), -1, jnp.int32)
for name, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
    for refresh in (1, 4, 8, 32):
        f = lambda: run(o, d, tmin, tmax, tmax, bp0, *args_sc, leaf=sc.leaf_size, refresh=refresh)
        out = f(); [np.asarray(x) for x in out]
        ts=[]
        for _ in range(3):
            t0=time.perf_counter(); out=f(); [np.asarray(x) for x in out]; ts.append(time.perf_counter()-t0)
        dt=float(np.median(ts))
        k = np.asarray(out[2]).ravel()[::TILE]
        cyc_tile = dt/ (N//TILE) * 0.94e9
        print(f"{name} refresh={refresh}: {dt*1e3:.2f}ms trips mean={k.mean():.1f} p50={np.median(k):.0f} p95={np.percentile(k,95):.0f} max={k.max()}  cyc/tile={cyc_tile:.0f} cyc/trip~={(cyc_tile-1700)/max(k.mean(),1):.0f}")
