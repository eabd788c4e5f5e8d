"""HBM traffic audit of the UNet3D bf16 forward (VERDICT r2 item 1).

Settles the 14%-MFU question with numbers instead of per-op anecdotes:

1. runs the production B=16 bf16 96^3 forward (folded BN) under a
   jax.profiler device trace (data-chained iterations);
2. parses the TPU "XLA Ops" trace events -- each event name is the
   full optimized-HLO definition line, so per-op operand/output HBM
   bytes AND device time come from one source;
3. emits a per-op table (bytes, time, effective GB/s), sums total HBM
   traffic per iteration, and compares against a hand-computed
   minimal-traffic model (each activation written once + read once,
   weights read once) -- measured/minimal <= 1.3x means the bandwidth
   roofline is proven; > 1.3x localizes the layout copies to kill.

Usage:  python tools/traffic_audit.py [--iters N] [--out FILE.md]
Run on the TPU (axon) backend; CPU runs compile but the trace numbers
are meaningless there.
"""

import argparse
import glob
import os
import re
import sys
import tempfile
import time

import numpy as np

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str):
    """Total bytes of an HLO shape string, e.g. 'bf16[16,96,96,96,32]'.

    Tuples contribute the sum of their elements.
    """
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def build_forward(batch=16, trim=0):
    import jax
    import jax.numpy as jnp

    from aind_exaspim_neuron_segmentation_tpu import inference

    runner = inference.load_model(affinity_mode=True)

    def fwd(variables, x):
        logits = runner.module.apply(
            variables, x, train=False, valid_trim=trim
        )
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 96, 96, 96, 1)
        ), jnp.float32,
    )
    jitted = jax.jit(fwd)
    return jitted, runner.variables, x


def capture_trace(jitted, variables, x, iters):
    import jax

    tmp = tempfile.mkdtemp(prefix="traffic_audit_")
    # warm/compile outside the trace
    y = jitted(variables, x)
    float(y[0, 0, 0, 0, 0])
    with jax.profiler.trace(tmp):
        xx = x
        for _ in range(iters):
            y = jitted(variables, xx)
            # data-chain so dispatch cannot overlap iterations
            xx = x + y[0, 0, 0, 0, 0] * 0
        checksum = float(y[0, 50, 50, 50, 0])
    del checksum
    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane produced under {tmp}")
    return paths[0]


_EV_RE = re.compile(
    r"%([\w.\-]+)\s*=\s*(\([^)]*\)|\w+\[[^\]]*\](?:\{[^}]*\})?)\s+"
    r"([\w\-]+)\((.*)$", re.S,
)


def parse_trace_ops(xplane_path, module_prefix="jit_fwd"):
    """Per-op totals from the TPU device plane, restricted to the
    target XLA module's execution windows.

    Each "XLA Ops" event name is the full HLO definition line --
    output shape, opcode, and operand shapes with layouts -- so
    operand/output HBM bytes come straight from the trace, no separate
    HLO parse or name join needed. Returns (ops, module_ns):
    ``ops``: name -> [bytes_in, bytes_out, opcode, total_ns, count];
    ``module_ns``: total device ns spent in the module.
    """
    import jax

    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(xplane_path, "rb").read()
    )
    ops = {}
    module_ns = 0.0
    for plane in data.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        windows = []
        op_lines = []
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    if ev.name.startswith(module_prefix):
                        windows.append((ev.start_ns, ev.end_ns))
                        module_ns += ev.duration_ns
            elif line.name == "XLA Ops":
                op_lines.append(line)
        for line in op_lines:
            for ev in line.events:
                mid = ev.start_ns + ev.duration_ns / 2
                if not any(a <= mid <= b for a, b in windows):
                    continue
                m = _EV_RE.match(ev.name)
                if not m:
                    continue
                name, out_shape, opcode, rest = m.groups()
                ent = ops.get(name)
                if ent is None:
                    b_out = shape_bytes(out_shape)
                    # operand shapes: every dtype[dims] token in the
                    # argument list (attrs after the closing paren hold
                    # no shapes for these op kinds)
                    b_in = shape_bytes(rest.split("), ")[0])
                    if opcode == "copy-done":
                        # operand is the copy-start result TUPLE
                        # (dest, src, context) -- summing it books the
                        # transfer ~3x. Real traffic: one source read
                        # (the write is b_out).
                        b_in = b_out
                    ent = ops[name] = [b_in, b_out, opcode, 0.0, 0]
                ent[3] += ev.duration_ns
                ent[4] += 1
    return ops, module_ns


def minimal_traffic_model(batch=16, trim=0, params=12_940_224):
    """Hand-computed minimum HBM bytes per forward iteration.

    Model: every activation tensor is written once by its producer and
    read once by its consumer(s) (skip connections read twice), weights
    read once, input read once, output written once. bf16 activations
    and weights; the final sigmoid output is f32 (3 channels).

    Channel ladder is the PRODUCTION trilinear UNet3D at width 1
    (models/unet3d.py ``factor = 2``): encoder (32, 64, 128, 256) with
    a HALVED 256-channel bottleneck, decoder DoubleConv mid = the skip
    width and out = half the level width (except the last, 32). An
    earlier revision of this tool modeled the non-trilinear ladder
    (512 bottleneck, unhalved decoder), overstating the minimum ~10%
    and flattering the measured/minimal ratio. ``params`` is the
    weight count actually read per iteration (main() passes the exact
    count from the built model).

    ``trim=t > 0`` models the valid-region-decoded forward
    (``UNet3D(valid_trim=t)``, models/unet3d.py): the final decoder
    stage computes only the kept core (upsample emits ``96 - 2(t-2)``
    rows per axis, VALID convs cascade ``-2`` each), the enc0 skip is
    read only over that support, and the cascaded up3 stage (trim ``s``
    from ``ops.upsample.x2_support_trim``) shrinks the same way. The
    encoder is unchanged (full receptive field still required).
    """
    chans = [32, 64, 128, 256, 256]  # trilinear: bottleneck halved
    # decoder (trilinear): x1 entering each upsample, DoubleConv mid
    # (= (up + skip) / 2) and out (= level width halved; last is 32)
    up_src = {3: 256, 2: 128, 1: 64, 0: 32}
    dec_mid = {3: 256, 2: 128, 1: 64, 0: 32}
    dec_out = {3: 128, 2: 64, 1: 32, 0: 32}
    res = [96, 48, 24, 12, 6]
    act = 2  # bf16
    B = batch
    total = 0
    entries = []

    def add(name, nbytes):
        nonlocal total
        entries.append((name, nbytes))
        total += int(nbytes)

    t = int(trim)
    s = 0
    if t >= 2:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from aind_exaspim_neuron_segmentation_tpu.ops.upsample import (
            x2_support_trim,
        )
        a = res[1]  # half-res rows feeding the final upsample
        s = x2_support_trim(a, t - 2, 2 * a - (t - 2))
        if s < 2 or a - 2 * s <= 0:
            s = 0

    # per-level decoder output dims (full forward unless trimmed)
    dec_dim = {lvl: res[lvl] for lvl in range(4)}
    up_dim = {lvl: res[lvl] for lvl in range(4)}
    skip_dim = {lvl: res[lvl] for lvl in range(4)}
    if t >= 2:
        up_dim[0] = res[0] - 2 * (t - 2)   # rows the sliced upsample emits
        skip_dim[0] = res[0] - 2 * (t - 2)
        dec_dim[0] = res[0] - 2 * t        # after the two VALID convs
        if s:
            up_dim[1] = res[1] - 2 * (s - 2)
            skip_dim[1] = res[1] - 2 * (s - 2)
            dec_dim[1] = res[1] - 2 * s

    # input volume (f32 read once)
    add("input f32", B * 96**3 * 1 * 4)
    # Encoder: each DoubleConv writes 2 activations at its resolution;
    # each is read by the next conv; skip tensors are read again by the
    # decoder concat. Downsample (maxpool) reads/writes once.
    for lvl in range(5):
        r, c = res[lvl], chans[lvl]
        n = B * r**3 * c * act
        add(f"enc{lvl} conv1 out ({r}^3 x{c})", 2 * n)  # write + read
        add(f"enc{lvl} conv2 out ({r}^3 x{c})", 2 * n)
        if lvl < 4:
            add(f"enc{lvl} skip reread",
                B * skip_dim[lvl]**3 * c * act)  # decoder concat read
            add(f"pool{lvl} out", 2 * (B * res[lvl + 1]**3 * c * act))
    # Decoder: 4 up levels; upsample writes at the higher res with the
    # lower level's channels, concat feeds DoubleConv (c_out = chans).
    # conv1 output sits between the upsample dim and the final dim.
    for lvl in range(3, -1, -1):
        r = res[lvl]
        c_up = up_src[lvl]
        u, d = up_dim[lvl], dec_dim[lvl]
        mid = d + 2 if d != r else r  # VALID conv1 out when trimmed
        add(f"up{lvl} upsampled ({u}^3 x{c_up})",
            2 * (B * u**3 * c_up * act))
        add(f"dec{lvl} conv1 out ({mid}^3 x{dec_mid[lvl]})",
            2 * (B * mid**3 * dec_mid[lvl] * act))
        add(f"dec{lvl} conv2 out ({d}^3 x{dec_out[lvl]})",
            2 * (B * d**3 * dec_out[lvl] * act))
    # output (f32, 3 channels, written once)
    out_dim = dec_dim[0]
    add(f"output f32 x3 ({out_dim}^3)", B * out_dim**3 * 3 * 4)
    # weights, read once (bf16)
    add(f"weights bf16 ({params / 1e6:.2f}M params)", params * act)
    return total, entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument(
        "--trim", type=int, default=0,
        help="valid_trim for the production trimmed forward "
             "(the minimal-traffic model adjusts to the trimmed "
             "dataflow)",
    )
    args = ap.parse_args()

    print("# building + compiling forward...", file=sys.stderr)
    jitted, variables, x = build_forward(args.batch, args.trim)

    print("# capturing device trace...", file=sys.stderr)
    t0 = time.time()
    xplane = capture_trace(jitted, variables, x, args.iters)
    wall = time.time() - t0
    ops, module_ns = parse_trace_ops(xplane)

    rows = []
    total_bytes = 0
    total_time = 0.0
    for name, (b_in, b_out, opcode, ns, count) in ops.items():
        # copy-start/copy-done pairs both carry the transfer; count the
        # done only (the start is async dispatch)
        if opcode == "copy-start":
            continue
        bts = (b_in + b_out) * (count / args.iters)
        per_iter_t = ns / 1e9 / args.iters
        total_bytes += bts
        total_time += per_iter_t
        gbs = bts / per_iter_t / 1e9 if per_iter_t > 0 else 0.0
        rows.append((name, opcode, b_in, b_out, per_iter_t, gbs,
                     count / args.iters))
    rows.sort(key=lambda r: -r[4])

    import jax as _jax

    n_params = sum(
        int(np.prod(v.shape))
        for v in _jax.tree_util.tree_leaves(variables)
    )
    minimal, model_entries = minimal_traffic_model(
        args.batch, args.trim, params=n_params
    )

    lines = []
    lines.append(f"# HBM traffic audit (B={args.batch} bf16 forward, "
                 f"{args.iters} chained iters, wall {wall:.1f}s)\n")
    lines.append("| op | kind | MB in | MB out | ms/iter | eff GB/s |")
    lines.append("|---|---|---|---|---|---|")
    for name, opcode, b_in, b_out, t, gbs, _n in rows[: args.top]:
        lines.append(
            f"| {name} | {opcode} | {b_in / 1e6:.1f} | {b_out / 1e6:.1f}"
            f" | {t * 1e3:.2f} | {gbs:.1f} |"
        )
    lines.append("")
    lines.append(f"- ops: {len(rows)}; op device time "
                 f"{total_time * 1e3:.1f} ms/iter; module window "
                 f"{module_ns / 1e6 / args.iters:.1f} ms/iter")
    lines.append(f"- measured HBM bytes/iter (sum of op operand"
                 f" + output buffers): {total_bytes / 1e9:.2f} GB")
    lines.append(f"- minimal-traffic model: {minimal / 1e9:.2f} GB "
                 "(each activation written once + read once, skips "
                 "reread, weights once)")
    ratio = total_bytes / minimal if minimal else float("inf")
    lines.append(f"- measured / minimal = {ratio:.2f}x")
    lines.append("")
    lines.append("Model detail:")
    for name, nbytes in model_entries:
        lines.append(f"  - {name}: {nbytes / 1e6:.1f} MB")
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
