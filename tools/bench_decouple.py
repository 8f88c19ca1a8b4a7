"""Micro-bench: which op decouples conv layouts from a Mosaic operand
constraint? A 3x3 256->256 conv on 256^2 feeds a trivial Pallas consumer
(row-major operand constraint, like the RoIAlign kernel); variants insert
candidate boundary ops. The conv alone takes ~0.4 ms when XLA is free to
pick layouts and ~2.7 ms when the constraint propagates into it."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = W = 256
    C = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, C)) * 0.1, jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.06, jnp.bfloat16)
    eye = jnp.eye(C, dtype=jnp.bfloat16)

    def convs(img):
        y = jax.lax.conv_general_dilated(
            img[None], k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        for _ in range(4):
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        return y[0]

    def consume_kernel(in_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            in_ref.at[pl.ds(0, 8), pl.ds(0, 16), slice(None)], scratch, sem
        )
        cp.start()
        cp.wait()
        out_ref[0, 0] = jnp.sum(scratch[...].astype(jnp.float32))

    def consume(feat):
        return pl.pallas_call(
            consume_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((8, 16, C), feat.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(feat)

    variants = {
        "no_consumer": lambda f: f.sum().astype(jnp.float32),
        "direct": lambda f: consume(f)[0, 0] + f.sum().astype(jnp.float32),
        "f32_convert": lambda f: consume(f.astype(jnp.float32))[0, 0]
        + f.sum().astype(jnp.float32),
        "identity_dot": lambda f: consume(
            jax.lax.dot_general(
                f, eye, (((2,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
            )
        )[0, 0]
        + f.sum().astype(jnp.float32),
        "flip": lambda f: consume(jnp.flip(f, axis=0))[0, 0]
        + f.sum().astype(jnp.float32),
        "transpose": lambda f: consume(jnp.transpose(f, (1, 0, 2)))[0, 0]
        + f.sum().astype(jnp.float32),
    }

    for name, post in variants.items():
        def prog(img):
            def body(acc, i):
                f = convs(img + i.astype(img.dtype))
                return acc + post(f), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(8, dtype=jnp.float32))
            return acc
        fn = jax.jit(prog)
        for _ in range(2):
            np.asarray(fn(x))
        t0 = time.perf_counter()
        for _ in range(8):
            np.asarray(fn(x))
        dt = (time.perf_counter() - t0) / 8 / 8
        print(f"{name:14s} {dt * 1e3:7.3f} ms per conv-chain")


if __name__ == "__main__":
    main()
