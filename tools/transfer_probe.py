"""Probe host->device transfer throughput through this image's tunnel, by
wire dtype.

Motivation: the bench's out_of_core section measured the opt-in f16 wire
format SLOWER than the f32 stream within one window (speedup 0.63, run of
2026-08-19 06:16) after an earlier window measured it 2.4x FASTER — either
the tunnel's effective rate is payload-dtype-dependent, or the f16 path
carries a hidden per-call cost (host cast, eager on-device upcast compile,
non-zero-copy staging).  This probe separates the layers:

  1. host cast cost            np.float32 -> wire dtype (CPU only)
  2. device_put wall time      per wire dtype, same logical snapshot count
  3. on-device upcast dispatch x.astype(f32) eager call (after warmup)

Run it twice back-to-back to see window-to-window variance.  No repo
imports; safe to run standalone: `python tools/transfer_probe.py [MB]`.
"""
import sys
import time

import numpy as np


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 64.0
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    n = int(mb * 2 ** 20 / 4)
    rng = np.random.default_rng(0)
    base = rng.standard_normal(n).astype(np.float32)

    # warm up every dtype path once (device_put + upcast compile)
    for dt in (np.float32, np.float16, np.uint16):
        small = base[:1024].astype(dt) if dt != np.uint16 else \
            base[:1024].astype(np.float16).view(np.uint16)
        x = jax.device_put(small)
        if dt == np.float16:
            _ = x.astype(jnp.float32)
        if dt == np.uint16:
            _ = jax.lax.bitcast_convert_type(x, jnp.float16).astype(
                jnp.float32)
        _ = float(jnp.sum(x.astype(jnp.float32)
                          if dt != np.uint16 else jnp.zeros(()))) \
            if dt != np.uint16 else None

    results = {}
    for name, make in [
        ("f32", lambda: base),
        ("f16", lambda: base.astype(np.float16)),
        ("u16_view", lambda: base.astype(np.float16).view(np.uint16)),
    ]:
        t0 = time.perf_counter()
        arr = make()
        t_cast = time.perf_counter() - t0

        # two timed transfers; fetch one element to force completion
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            x = jax.device_put(arr)
            if name == "u16_view":
                y = jax.lax.bitcast_convert_type(x, jnp.float16).astype(
                    jnp.float32)
            elif name == "f16":
                y = x.astype(jnp.float32)
            else:
                y = x
            _ = float(y[0])          # completion fence through the tunnel
            times.append(time.perf_counter() - t0)
        payload_mb = arr.nbytes / 2 ** 20
        best = min(times)
        results[name] = dict(cast_s=round(t_cast, 3),
                             payload_mb=round(payload_mb, 1),
                             put_s=[round(t, 3) for t in times],
                             mbps=round(payload_mb / best, 1))
        print(f"{name:9s} cast {t_cast:6.3f}s  payload {payload_mb:7.1f} MB"
              f"  put {times}  -> {payload_mb/best:7.1f} MB/s", flush=True)

    f32 = results["f32"]["mbps"]
    for k in ("f16", "u16_view"):
        r = results[k]["mbps"] / f32 if f32 else float("nan")
        print(f"{k} effective speedup over f32 (logical snapshots/s): "
              f"{2*r:.2f}x  (wire rate ratio {r:.2f})", flush=True)


if __name__ == "__main__":
    main()
