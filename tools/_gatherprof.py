import time, jax, jax.numpy as jnp, numpy as np

N = 480_000  # ~ total bin-map rows across octaves
K = 2048
T = 25  # taps per keypoint (9 ori + 16 desc)

key = jax.random.PRNGKey(0)
maps = jax.random.normal(key, (N, 8), jnp.float32)
idx = jax.random.randint(key, (K, T), 0, N - 700)
fx = jax.random.uniform(key, (K, T, 1))
fy = jax.random.uniform(key, (K, T, 1))
W2 = 620


def timeit(name, fn, *args, n=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")
    return out


@jax.jit
def variant_a(maps, idx, fx, fy):
    v00 = jnp.take(maps, idx, axis=0, mode="clip")
    v10 = jnp.take(maps, idx + 1, axis=0, mode="clip")
    v01 = jnp.take(maps, idx + W2, axis=0, mode="clip")
    v11 = jnp.take(maps, idx + W2 + 1, axis=0, mode="clip")
    return v00*(1-fx)*(1-fy) + v10*fx*(1-fy) + v01*(1-fx)*fy + v11*fx*fy


@jax.jit
def variant_b(maps, idx, fx, fy):
    quad = jnp.concatenate(
        [maps, jnp.roll(maps, -1, 0), jnp.roll(maps, -W2, 0), jnp.roll(maps, -W2 - 1, 0)],
        axis=-1,
    )  # [N, 32]
    q = jnp.take(quad, idx, axis=0, mode="clip")  # [K, T, 32]
    v00, v10, v01, v11 = q[..., 0:8], q[..., 8:16], q[..., 16:24], q[..., 24:32]
    return v00*(1-fx)*(1-fy) + v10*fx*(1-fy) + v01*(1-fx)*fy + v11*fx*fy


@jax.jit
def variant_b2(quad, idx, fx, fy):
    q = jnp.take(quad, idx, axis=0, mode="clip")  # [K, T, 32]
    v00, v10, v01, v11 = q[..., 0:8], q[..., 8:16], q[..., 16:24], q[..., 24:32]
    return v00*(1-fx)*(1-fy) + v10*fx*(1-fy) + v01*(1-fx)*fy + v11*fx*fy


@jax.jit
def make_quad(maps):
    return jnp.concatenate(
        [maps, jnp.roll(maps, -1, 0), jnp.roll(maps, -W2, 0), jnp.roll(maps, -W2 - 1, 0)],
        axis=-1,
    )


@jax.jit
def variant_c(maps, idx, fx, fy):
    # single flat-index gather: flatten rows to scalars [N*8] and gather 8 scalars per row
    flat = maps.reshape(-1)
    lane = jnp.arange(8)
    def g(i):
        return jnp.take(flat, i[..., None] * 8 + lane, mode="clip")
    v00, v10, v01, v11 = g(idx), g(idx+1), g(idx+W2), g(idx+W2+1)
    return v00*(1-fx)*(1-fy) + v10*fx*(1-fy) + v01*(1-fx)*fy + v11*fx*fy


timeit("A: 4x take [N,8]", variant_a, maps, idx, fx, fy)
timeit("B: quad build + 1x take [N,32]", variant_b, maps, idx, fx, fy)
quad = make_quad(maps)
timeit("B2: 1x take prebuilt [N,32]", variant_b2, quad, idx, fx, fy)
timeit("quad build only", make_quad, maps)
timeit("C: scalar-flat gather", variant_c, maps, idx, fx, fy)
