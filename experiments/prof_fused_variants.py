"""Attribute the fused engine's 30x TPU slowdown: direction gather vs baby
scatter vs the loop itself.  Trimmed fused loop (no theta/phi) with each
suspect op toggled; plus one-hot window-select / scalar dynamic-slice probes
for the windowed-fused design."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, math, functools
import jax, jax.numpy as jnp, numpy as np

D, B, R = 20, 8192, 100
SIGMA = 0.1
NORM = -D * (math.log(SIGMA) + 0.5 * math.log(2 * math.pi))
LOGZERO = -1e30
PH_RUN, PH_DONE = 0, 1  # collapsed state machine: shrink-only loop


def loglike(cube):  # (B, D) -> (B,)
    ok = jnp.all((cube >= 0.0) & (cube <= 1.0), axis=1)
    d = (cube - 0.5) / SIGMA
    return jnp.where(ok, NORM - 0.5 * jnp.sum(d * d, axis=1), LOGZERO)


def make_engine(gather_dirs: bool, scatter_out: bool):
    """Shrink-only fused chain over R repeats (enough iterations/structure to
    attribute costs; not the full phase machine)."""

    @jax.jit
    def run(key, x0, bound, nhats):
        Bloc = x0.shape[0]
        loop_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(Bloc))

        def draw(rep, it):
            return jax.vmap(
                lambda k, r, c: jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(k, r), c), ()
                )
            )(loop_keys, rep, it)

        out0 = jnp.zeros((Bloc, R, D + 1), jnp.float32)
        rep0 = jnp.zeros((Bloc,), jnp.int32)
        w = jnp.float32(3 * SIGMA)
        u0 = draw(rep0, jnp.full((Bloc,), 2**30, jnp.int32))
        st = dict(
            rep=rep0, it=jnp.zeros((Bloc,), jnp.int32),
            tL=-u0 * w, tR=(1 - u0) * w,
            phase=jnp.zeros((Bloc,), jnp.int32),
            x0=x0, nhat=nhats[:, 0] if gather_dirs else nhats[:, 0],
            out=out0, nlike=jnp.zeros((Bloc,), jnp.int32),
            iters=jnp.zeros((), jnp.int32),
        )

        def cond(s):
            return jnp.any(s["phase"] != PH_DONE) & (s["iters"] < R * 120)

        def body(s):
            u = draw(s["rep"], s["it"])
            t = s["tL"] + u * (s["tR"] - s["tL"])
            probe = s["x0"] + t[:, None] * s["nhat"]
            logL = loglike(probe)
            active = s["phase"] == PH_RUN
            inside = (logL >= bound) & active
            nlike = s["nlike"] + active.astype(jnp.int32)
            acc = inside
            tR = jnp.where(~acc & (t > 0), t, s["tR"])
            tL = jnp.where(~acc & (t <= 0), t, s["tL"])

            if scatter_out:
                baby = jnp.concatenate([probe, logL[:, None]], axis=1)
                wrep = jnp.where(acc, s["rep"], R)
                out = s["out"].at[jnp.arange(Bloc), wrep].set(
                    baby, mode="drop", unique_indices=True
                )
            else:
                out = s["out"]

            new_rep = jnp.where(acc, s["rep"] + 1, s["rep"])
            if gather_dirs:
                idx = jnp.minimum(new_rep, R - 1)
                nhat = jnp.take_along_axis(nhats, idx[:, None, None], axis=1)[:, 0]
            else:
                nhat = s["nhat"]
            u0n = draw(new_rep, jnp.full((Bloc,), 2**30, jnp.int32))
            done = acc & (new_rep >= R)
            return dict(
                rep=new_rep, it=jnp.where(acc, 0, s["it"] + 1),
                tL=jnp.where(acc, -u0n * w, tL), tR=jnp.where(acc, (1 - u0n) * w, tR),
                phase=jnp.where(done, PH_DONE, s["phase"]),
                x0=jnp.where(acc[:, None], probe, s["x0"]),
                nhat=jnp.where(acc[:, None], nhat, s["nhat"]),
                out=out, nlike=nlike, iters=s["iters"] + 1,
            )

        s = jax.lax.while_loop(cond, body, st)
        # depend on out so the scatter can't be DCE'd
        dep = (s["out"].sum() * 0).astype(jnp.int32) if scatter_out else 0
        return s["nlike"].sum() + dep, s["iters"]

    return run


def timeit(name, fn, *args, reps=3):
    r = fn(*args)
    n0 = int(np.asarray(r[0]))
    ts = []
    for k in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        n = int(np.asarray(out[0])); it = int(np.asarray(out[1]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} min={min(ts)*1e3:9.1f}ms  iters={it:6d} evals={n}", flush=True)


key = jax.random.PRNGKey(0)
x0 = jnp.full((B, D), 0.5, jnp.float32)
r0 = SIGMA * math.sqrt(D) * 1.5
bound = jnp.float32(NORM - 0.5 * (r0 / SIGMA) ** 2)
nh = jax.random.normal(key, (B, R, D))
nh = nh / jnp.linalg.norm(nh, axis=2, keepdims=True)
x0, nh = jax.block_until_ready(jax.device_put((x0, nh)))

for gd in (False, True):
    for so in (False, True):
        timeit(f"fused gather={gd} scatter={so}", make_engine(gd, so), key, x0, bound, nh)

# ---- windowed-design primitives -------------------------------------------
W = 16


@jax.jit
def window_probe(key, x0, bound, nh):
    """Fused loop with one-hot window select + pending-baby register +
    shift-by-S flush every S iterations (S=4)."""
    S = 4
    Bloc = x0.shape[0]
    loop_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(Bloc))

    def draw(rep, it):
        return jax.vmap(
            lambda k, r, c: jax.random.uniform(
                jax.random.fold_in(jax.random.fold_in(k, r), c), ()
            )
        )(loop_keys, rep, it)

    w = jnp.float32(3 * SIGMA)
    u0 = draw(jnp.zeros((Bloc,), jnp.int32), jnp.full((Bloc,), 2**30, jnp.int32))
    st = dict(
        rep=jnp.zeros((Bloc,), jnp.int32), it=jnp.zeros((Bloc,), jnp.int32),
        tL=-u0 * w, tR=(1 - u0) * w,
        phase=jnp.zeros((Bloc,), jnp.int32),
        x0=x0,
        win=jax.lax.dynamic_slice(nh, (0, 0, 0), (Bloc, W, D)),  # direction window
        owin=jnp.zeros((Bloc, W, D + 1), jnp.float32),            # baby window
        out=jnp.zeros((Bloc, R + W, D + 1), jnp.float32),
        base=jnp.zeros((), jnp.int32),
        nlike=jnp.zeros((Bloc,), jnp.int32), iters=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["phase"] != PH_DONE) & (s["iters"] < R * 120)

    def body(s):
        u = draw(s["rep"], s["it"])
        # one-hot select of this lane's current direction from the window
        off = jnp.clip(s["rep"] - s["base"], 0, W - 1)
        oh = jax.nn.one_hot(off, W, dtype=jnp.float32)  # (B, W)
        nhat = jnp.einsum("bw,bwd->bd", oh, s["win"])
        t = s["tL"] + u * (s["tR"] - s["tL"])
        probe = s["x0"] + t[:, None] * nhat
        logL = loglike(probe)
        stalled = s["rep"] - s["base"] >= W
        active = (s["phase"] == PH_RUN) & ~stalled
        inside = (logL >= bound) & active
        nlike = s["nlike"] + active.astype(jnp.int32)
        acc = inside
        tR = jnp.where(~acc & (t > 0) & active, t, s["tR"])
        tL = jnp.where(~acc & (t <= 0) & active, t, s["tL"])

        baby = jnp.concatenate([probe, logL[:, None]], axis=1)
        owin = s["owin"] + oh[:, :, None] * jnp.where(acc, 1.0, 0.0)[:, None, None] * baby[:, None, :]

        new_rep = jnp.where(acc, s["rep"] + 1, s["rep"])
        u0n = draw(new_rep, jnp.full((Bloc,), 2**30, jnp.int32))
        done = acc & (new_rep >= R)

        # every S iterations: flush S rows, advance window
        do_shift = (s["iters"] + 1) % S == 0
        def shift(vals):
            win, owin, out, base = vals
            out = jax.lax.dynamic_update_slice(
                out, owin[:, :S], (0, base, 0)
            )
            win = jnp.concatenate(
                [win[:, S:], jax.lax.dynamic_slice(
                    nh, (0, jnp.minimum(base + W, R - W) * 0 + jnp.minimum(base + W, R - 1), 0), (Bloc, S, D))],
                axis=1,
            )
            owin = jnp.concatenate([owin[:, S:], jnp.zeros((Bloc, S, D + 1))], axis=1)
            return win, owin, out, base + S
        win, owin, out, base = jax.lax.cond(
            do_shift, shift, lambda v: v, (s["win"], owin, s["out"], s["base"])
        )

        return dict(
            rep=new_rep, it=jnp.where(acc, 0, s["it"] + 1),
            tL=jnp.where(acc, -u0n * w, tL), tR=jnp.where(acc, (1 - u0n) * w, tR),
            phase=jnp.where(done, PH_DONE, s["phase"]),
            x0=jnp.where(acc[:, None], probe, s["x0"]),
            win=win, owin=owin, out=out, base=base,
            nlike=nlike, iters=s["iters"] + 1,
        )

    s = jax.lax.while_loop(cond, body, st)
    return s["nlike"].sum() + (s["out"].sum() * 0).astype(jnp.int32), s["iters"]


timeit("windowed one-hot W=16 S=4", window_probe, key, x0, bound, nh)
