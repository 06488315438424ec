"""Multi-chip rendering: shard_map over a (view, space) device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.5); multi-chip
scaling is new capability, designed TPU-first rather than ported:

  * the problem is pixel- and view-parallel, so the natural mesh is 2-D:
    - "view"  axis: the [V, G] weight matrix (and the output view dim) is
      sharded like a tensor-parallel layer;
    - "space" axis: output rows are sharded; each shard renders only its row
      block by folding the block offset into the clamped-shift dynamic_slice
      (no halo exchange -- the image stack is replicated, so the hot loop has
      ZERO inter-chip communication; ICI is used only for the initial
      broadcast of inputs).
  * outputs stay sharded; gather them only at the host boundary.

Throughput therefore scales linearly in chips for the blend (each chip does
V/nv x H/ns of the work).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import blend_xla


def make_mesh(
    devices: list | None = None, view_parallel: int | None = None
) -> Mesh:
    """Build a (view, space) mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if view_parallel is None:
        # Prefer splitting views (weight rows) 2-way when possible; rows take
        # the rest. Views come in 64s, rows in thousands.
        view_parallel = 2 if n % 2 == 0 and n > 1 else 1
    if n % view_parallel != 0:
        raise ValueError(f"{n} devices not divisible by view_parallel={view_parallel}")
    arr = np.array(devices).reshape(view_parallel, n // view_parallel)
    return Mesh(arr, axis_names=("view", "space"))


def replicate(mesh: Mesh, x: jnp.ndarray) -> jnp.ndarray:
    """Place an array replicated over every device of the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_weights(mesh: Mesh, weights: jnp.ndarray, dim: int = 0) -> jnp.ndarray:
    """Shard a weight matrix's view dimension over the mesh's "view" axis."""
    spec = [None] * weights.ndim
    spec[dim] = "view"
    return jax.device_put(weights, NamedSharding(mesh, P(*spec)))


def shard_inputs(
    mesh: Mesh,
    images: jnp.ndarray,  # [G, C, H, W]
    weights: jnp.ndarray,  # [V, G]
):
    """Place the stack (replicated) and weights (view-sharded) on the mesh."""
    return replicate(mesh, images), shard_weights(mesh, weights)


@partial(jax.jit, static_argnames=("mesh",))
def render_fixed_sharded(
    mesh: Mesh,
    images: jnp.ndarray,  # [G, C, H, W] uint8, replicated
    weights: jnp.ndarray,  # [V, G] float32, sharded over "view"
    focused_offsets: jnp.ndarray,  # [G, 2] int32, replicated
) -> jnp.ndarray:
    """Fixed-focus render sharded over (views x rows) -> [V, C, H, W] uint8,
    output sharded P('view', None, 'space', None)."""
    g, c, h, w = images.shape
    n_space = mesh.shape["space"]
    if h % n_space != 0:
        raise ValueError(f"H={h} must divide by the space axis ({n_space})")
    h_local = h // n_space

    def local_render(images_l, weights_l, offs_l):
        row0 = jax.lax.axis_index("space") * h_local

        def shift_one(img, o):
            out = blend_xla.shift_axis_clamped(
                img, o[1], axis=1, start=row0, size=h_local
            )
            return blend_xla.shift_axis_clamped(out, o[0], axis=2)

        shifted = jax.vmap(shift_one)(images_l, offs_l)  # [G, C, h_local, W]
        return blend_xla.blend(shifted, weights_l)

    return shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P("view", None), P()),
        out_specs=P("view", None, "space", None),
    )(images, weights, focused_offsets)


@partial(
    jax.jit,
    static_argnames=("mesh", "h", "w", "px", "py"),
)
def render_fixed_sharded_pallas(
    mesh: Mesh,
    padded: jnp.ndarray,  # [G, C, Hp, Wp] uint8 (blend_pallas.pad_images), replicated
    weights: jnp.ndarray,  # [V, G] float32, sharded over "view"
    focused_offsets: jnp.ndarray,  # [G, 2] int32, replicated
    *,
    h: int,
    w: int,
    px: int,
    py: int,
) -> jnp.ndarray:
    """Fixed-focus render with the fused Pallas MXU kernel on every shard.

    Each shard runs the single-chip kernel on its own row block (row_start
    folded into the clamp-shift slice starts) with its view-shard of the
    weights -- same zero-communication layout as render_fixed_sharded, but
    at the fused kernel's throughput. Requires H divisible by the space
    axis; TPU (or interpret-mode) only.
    """
    from ..ops import blend_pallas

    n_space = mesh.shape["space"]
    if h % n_space != 0:
        raise ValueError(f"H={h} must divide by the space axis ({n_space})")
    h_local = h // n_space

    def local_render(padded_l, weights_l, offs_l):
        row0 = jax.lax.axis_index("space") * h_local
        return blend_pallas.render_fixed_padded(
            padded_l, weights_l, offs_l,
            h=h, w=w, px=px, py=py,
            row_start=row0, row_count=h_local,
        )

    return shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P("view", None), P()),
        out_specs=P("view", None, "space", None),
        check_vma=False,
    )(padded, weights, focused_offsets)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "method", "radius", "filter_radius", "steps", "pad",
        "exact_taps", "spread", "spans",
    ),
)
def render_all_focus_sharded(
    mesh: Mesh,
    images: jnp.ndarray,  # [G, C, H, W] uint8, replicated
    weights: jnp.ndarray,  # [V, G] float32, sharded over "view"
    offsets: jnp.ndarray,  # [G, 2] float32, replicated
    focus: jnp.ndarray,
    focus_range: jnp.ndarray,
    focus_ids: jnp.ndarray,  # [K] int32, replicated
    *,
    method: str = "STD",
    radius: tuple[int, int] = (2, 2),
    filter_radius: tuple[int, int] = (0, 0),
    steps: int = 32,
    pad: tuple[int, int] = (64, 64),
    exact_taps: bool = True,
    spread: int | None = None,
    spans: tuple[int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full all-in-focus pipeline over the (view x space) mesh.

    Per shard: estimate its own row block of the focus map (inputs are
    replicated, so the disparity search needs no halo exchange), all_gather
    the tiny [H, W] map over the space axis (the box filter's halo is the
    only cross-shard dependency in the whole pipeline), filter + blend its
    row block with its view-shard of the weight matrix.

    Returns (views sharded P('view', None, 'space', None),
             maps [2, H, W] sharded P(None, 'space', None)).
    """
    from ..ops import focus as focus_ops

    g, c, h, w = images.shape
    n_space = mesh.shape["space"]
    if h % n_space != 0:
        raise ValueError(f"H={h} must divide by the space axis ({n_space})")
    h_local = h // n_space

    def local_fn(images_l, weights_l, offsets_l, ids_l, focus, focus_range):
        row0 = jax.lax.axis_index("space") * h_local
        selected = images_l[ids_l]
        sel_offsets = offsets_l[ids_l]
        map0_l = focus_ops.estimate_focus_map(
            selected, sel_offsets, focus, focus_range, radius,
            steps=steps, pad=pad, row_start=row0, row_count=h_local,
            exact_taps=exact_taps, spans=spans,
        )
        # Only cross-shard dependency: the filter halo. The map is tiny.
        map0_full = jax.lax.all_gather(map0_l, "space", tiled=True)
        map1_l = focus_ops.filter_focus_map_block(
            map0_full, filter_radius, row0, h_local
        )
        if method == "STD":
            views_l = blend_xla.render_allfocus_quantized(
                images_l, weights_l, offsets_l, map1_l, focus, focus_range,
                steps=steps, pad=pad, row_start=row0, row_count=h_local,
                all_bytes=True,
            )
        else:
            from ..ops import allfocus_pallas, blend_pallas

            if (
                spread is not None
                and blend_pallas.is_available()
                and allfocus_pallas.supports(
                    h, w, spread, row_count=h_local
                )
            ):
                # fused allFocus kernel per shard: the kernel reads the
                # full replicated stack but emits only this shard's rows
                views_l = allfocus_pallas.render_allfocus_quantized_fused(
                    images_l, weights_l, offsets_l, map0_l, focus,
                    focus_range, steps=steps, spread=spread, px=pad[0],
                    row_start=row0, row_count=h_local,
                )
            else:
                views_l = blend_xla.render_allfocus_quantized(
                    images_l, weights_l, offsets_l, map0_l, focus,
                    focus_range, steps=steps, pad=pad,
                    row_start=row0, row_count=h_local,
                )
        return views_l, jnp.stack([map0_l, map1_l])

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P("view", None), P(), P(), P(), P()),
        out_specs=(
            P("view", None, "space", None),
            P(None, "space", None),
        ),
        check_vma=False,
    )(images, weights, offsets, focus_ids,
      jnp.asarray(focus, jnp.float32), jnp.asarray(focus_range, jnp.float32))


def gather_views(views: jnp.ndarray) -> np.ndarray:
    """Fetch a (possibly sharded) view stack to the host as [V, H, W, C]."""
    return np.asarray(blend_xla.from_planar(jax.device_get(views)))
