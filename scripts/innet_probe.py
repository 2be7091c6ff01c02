"""Round-3 probe: the in_net is the model's MXU sink (bwd_gap_probe:
4-stream in_net f+b = 69.7 ms at B=64 = 21.4 TF/s, vs 119 TF/s for the
280-channel chain).  Ideal f+b is ~7.6 ms — a ~60 ms/step recovery at
bs=64 if any formulation gets close.

Times fwd+bwd for in_net formulations (chs=70, 27->70 then 70->70 x5,
4 streams, bf16, B x 96 x 96) and the OutNet both ways:

  xla          StreamNet x4 exactly as the model runs it (baseline)
  xla-batch    h/v and i/d stream pairs batched 2B with ACTIVATION
               re-orientation (kernels then shared verbatim)
  im2col       taps folded into K: one (BHW, 4Cin)@(4Cin, Cout) dot per
               conv (K=108/280 vs XLA's M=70-on-lanes padding)
  pad128       weights zero-padded Cout/Cin 70->128: 3.3x the FLOPs but
               full MXU tiles end to end
  pallas       PallasStreamNet x4 (the --pallas_trunk formulation)
  outnet-xla / outnet-pallas   the 8-block out_net both ways

All formulation outputs are checked against the XLA baseline before
timing (fwd max-abs-diff printed; bf16 tolerance).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/innet_probe.py [B]
"""
import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H = int(os.environ.get('INNET_PROBE_H', '96'))
CIN, C = 27, 70
BLOCKS = 3
DT = jnp.bfloat16


def sync(r):
    leaf = [l for l in jax.tree_util.tree_leaves(r)
            if hasattr(l, 'ravel')][0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, n=8, name='', flops=None):
    r = fn(*args)
    sync(r)
    sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
        sync(r)
    dt = (time.time() - t0) / n * 1000
    extra = f'  {flops / dt * 1e-9:7.1f} TF/s' if flops else ''
    print(f'{name:34s} {dt:9.2f} ms{extra}', flush=True)
    return dt


def make_params(rng):
    """BLOCKS blocks of (w1, b1, w2, b2, gamma, beta), fp32 masters."""
    params = []
    cin = CIN
    for i in range(BLOCKS):
        params.append(tuple(jnp.asarray(a, jnp.float32) for a in (
            rng.standard_normal((2, 2, cin, C)) / np.sqrt(4 * cin),
            rng.standard_normal(C) * 0.1,
            rng.standard_normal((2, 2, C, C)) / np.sqrt(4 * C),
            rng.standard_normal(C) * 0.1,
            np.abs(rng.standard_normal(C)) + 0.5,
            rng.standard_normal(C) * 0.1,
        )))
        cin = C
    return params


def orient(w, o):
    if o in ('t', 'tf'):
        w = jnp.swapaxes(w, 0, 1)
    if o == 'tf':
        w = jnp.flip(w, axis=0)
    return w


def bn_affine(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    s = scale * jax.lax.rsqrt(var + 1e-5)
    t = bias - mean * s
    return x * s.astype(x.dtype) + t.astype(x.dtype)


def conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), list(pad),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def stream_xla(params, x, o):
    for (w1, b1, w2, b2, g, be) in params:
        x = jax.nn.relu(conv(x, orient(w1, o), ((1, 1), (1, 1)))
                        + b1.astype(x.dtype))
        x = conv(x, orient(w2, o), ((0, 0), (0, 0))) + b2.astype(x.dtype)
        x = jax.nn.relu(bn_affine(x, g, be))
    return x


# ---------------------------------------------------------------- im2col
def conv_gemm(x, w, pad):
    """k=2 conv as pad + 4-tap concat + one dot.  Tap order matches the
    row-major (2,2,Cin,Cout) -> (4*Cin, Cout) reshape."""
    b, h, wd, cin = x.shape
    p = pad[0][0]
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    ho, wo = x.shape[1] - 1, x.shape[2] - 1
    taps = [x[:, dy:dy + ho, dx:dx + wo, :]
            for dy in (0, 1) for dx in (0, 1)]
    patches = jnp.concatenate(taps, axis=-1)
    cout = w.shape[-1]
    return jnp.dot(patches, w.reshape(4 * cin, cout).astype(x.dtype))


def stream_im2col(params, x, o):
    for (w1, b1, w2, b2, g, be) in params:
        x = jax.nn.relu(conv_gemm(x, orient(w1, o), ((1, 1), (1, 1)))
                        + b1.astype(x.dtype))
        x = conv_gemm(x, orient(w2, o), ((0, 0), (0, 0))) \
            + b2.astype(x.dtype)
        x = jax.nn.relu(bn_affine(x, g, be))
    return x


# ---------------------------------------------------------------- pad128
CP = 128


def pad_params(params):
    """Zero-pad every block to CP channels (first block pads Cin->CIN
    only on w1's input axis, which stays 27: the INPUT is not padded)."""
    out = []
    for i, (w1, b1, w2, b2, g, be) in enumerate(params):
        cin = w1.shape[2]
        cin_pad = 0 if i == 0 else CP - cin
        w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, cin_pad), (0, CP - C)))
        w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, CP - C), (0, CP - C)))
        b1p = jnp.pad(b1, (0, CP - C))
        b2p = jnp.pad(b2, (0, CP - C))
        # padded channels: scale 1, bias 0 -> BN keeps them at exactly 0
        gp = jnp.pad(g, (0, CP - C), constant_values=1.0)
        bep = jnp.pad(be, (0, CP - C))
        out.append((w1p, b1p, w2p, b2p, gp, bep))
    return out


def stream_pad128(padded, x, o):
    for (w1, b1, w2, b2, g, be) in padded:
        x = jax.nn.relu(conv(x, orient(w1, o), ((1, 1), (1, 1)))
                        + b1.astype(x.dtype))
        x = conv(x, orient(w2, o), ((0, 0), (0, 0))) + b2.astype(x.dtype)
        x = jax.nn.relu(bn_affine(x, g, be))
    return x[..., :C]


# ------------------------------------------------------------- batching
def four_streams(stream_fn, params, xs):
    tot = 0.0
    for x, o in zip(xs, ('t', 'n', 'tf', 'n')):
        tot += jnp.sum(stream_fn(params, x, o).astype(jnp.float32))
    return tot


def batched_streams(params, xs):
    """h/v and i/d pairs share weights; re-orient the ACTIVATIONS (one
    transpose each) so both pair members run in one 2B conv with the
    plain kernel."""
    xh, xv, xi, xd = xs
    xb = jnp.concatenate([jnp.swapaxes(xh, 1, 2), xv,
                          jnp.flip(jnp.swapaxes(xi, 1, 2), axis=1), xd])
    y = stream_xla(params, xb, 'n')
    return jnp.sum(y.astype(jnp.float32))


def main():
    print(f'device: {jax.devices()[0]}  B={B}', flush=True)
    rng = np.random.default_rng(0)
    params = make_params(rng)
    xs = [jnp.asarray(rng.standard_normal((B, H, H, CIN)) * 0.3, DT)
          for _ in range(4)]

    # useful-FLOP convention: fwd+bwd = 3x fwd, 4 taps, 4 streams
    fl = 3 * 4 * B * H * H * 4 * (CIN * C + (2 * BLOCKS - 1) * C * C) * 2

    # equivalence vs the XLA baseline (single stream, fwd, orientation t)
    ref = stream_xla(params, xs[0], 't').astype(jnp.float32)
    for name, fn in (
            ('im2col', stream_im2col),
            ('pad128', lambda p, x, o: stream_pad128(pad_params(p), x, o)),
    ):
        d = jnp.max(jnp.abs(fn(params, xs[0], 't').astype(jnp.float32)
                            - ref))
        print(f'check {name:10s} max|d| = {float(d):.3e}', flush=True)
    xb = jnp.swapaxes(xs[0], 1, 2)
    d = jnp.max(jnp.abs(stream_xla(params, xb, 'n').astype(jnp.float32)
                        - jnp.swapaxes(ref, 1, 2)))
    print(f'check batch-t    max|d| = {float(d):.3e}', flush=True)

    g0 = jax.jit(jax.grad(partial(four_streams, stream_xla)))
    timeit(lambda: g0(params, xs), name='in_net xla x4 f+b', flops=fl)

    gb = jax.jit(jax.grad(batched_streams))
    timeit(lambda: gb(params, xs), name='in_net xla-batch f+b', flops=fl)

    gi = jax.jit(jax.grad(partial(four_streams, stream_im2col)))
    timeit(lambda: gi(params, xs), name='in_net im2col f+b', flops=fl)

    def pad_loss(params, xs):
        padded = pad_params(params)
        tot = 0.0
        for x, o in zip(xs, ('t', 'n', 'tf', 'n')):
            tot += jnp.sum(stream_pad128(padded, x, o).astype(jnp.float32))
        return tot
    gp = jax.jit(jax.grad(pad_loss))
    timeit(lambda: gp(params, xs), name='in_net pad128 f+b', flops=fl)

    def pad_batch_loss(params, xs):
        padded = pad_params(params)
        xh, xv, xi, xd = xs
        xb = jnp.concatenate([jnp.swapaxes(xh, 1, 2), xv,
                              jnp.flip(jnp.swapaxes(xi, 1, 2), axis=1),
                              xd])
        return jnp.sum(stream_pad128(padded, xb, 'n').astype(jnp.float32))
    gpb = jax.jit(jax.grad(pad_batch_loss))
    timeit(lambda: gpb(params, xs), name='in_net pad128+batch f+b',
           flops=fl)

    # Pallas stream net (the --pallas_trunk in_net), via the flax module
    from mmlf_tpu.models.pallas_trunk import PallasStreamNet
    from mmlf_tpu.ops.pallas.conv_block import from_canvas
    net = PallasStreamNet(BLOCKS, C, 2, True, 0.1, dtype=DT)
    v = net.init(jax.random.PRNGKey(0), xs[0], True)

    def loss_pl(p, xs):
        tot = 0.0
        for x, o in zip(xs, ('t', 'n', 'tf', 'n')):
            (xc, si, ti, (h, w)), _ = net.apply(
                {'params': p, 'batch_stats': v['batch_stats']}, x, True, o,
                mutable=['batch_stats'])
            y = from_canvas(xc, h, w)
            y = jax.nn.relu(y * si.astype(y.dtype) + ti.astype(y.dtype))
            tot += jnp.sum(y.astype(jnp.float32))
        return tot
    gpl = jax.jit(jax.grad(loss_pl))
    timeit(lambda: gpl(v['params'], xs), name='in_net pallas x4 f+b',
           flops=fl)

    # ------------------------------------------------ out_net both ways
    from mmlf_tpu.models.feed_forward import OutNet
    from mmlf_tpu.models.pallas_trunk import PallasOutNet
    xo = jnp.asarray(rng.standard_normal((B, H, H, 280)) * 0.3,
                     jnp.float32)
    # 7 full blocks (2 convs each, 97^2/96^2) + last block projecting at
    # conv1 (280->2 at 97^2, then 2->2) — see bench.conv_flops_per_patch
    fl_o = 3 * 2 * 4 * B * (280 * 280 * 7 * ((H + 1) ** 2 + H * H)
                            + 280 * 2 * (H + 1) ** 2 + 2 * 2 * H * H)

    onet = OutNet(8, 280, 2, 2, True, 0.1, dtype=DT)
    vo = onet.init(jax.random.PRNGKey(0), xo, True)

    def loss_o(p, x):
        out, _ = onet.apply(
            {'params': p, 'batch_stats': vo['batch_stats']}, x, True,
            mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32))
    timeit(jax.jit(jax.grad(loss_o)), vo['params'], xo,
           name='out_net xla f+b', flops=fl_o)

    pnet = PallasOutNet(8, 280, 2, 2, True, 0.1, dtype=DT)
    vp = pnet.init(jax.random.PRNGKey(0), xo, True)

    def loss_p(p, x):
        out, _ = pnet.apply(
            {'params': p, 'batch_stats': vp['batch_stats']}, x, True,
            mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32))
    timeit(jax.jit(jax.grad(loss_p)), vp['params'], xo,
           name='out_net pallas f+b', flops=fl_o)


if __name__ == '__main__':
    main()
