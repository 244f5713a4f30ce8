"""LBVH: GPU-style linear BVH over primitive AABBs, pure JAX.

Replaces the reference's embree SAH build + GEN_RT node packing
(mesa-vulkan-sim lvp_acceleration_structure.c:606-1351) and its software
traversal (vulkan_ray_tracing.cc:422-1171 `traceRay`) with:

* **Build** (Karras 2012 binary radix tree): every internal node computed
  independently from the sorted Morton codes — one vmapped O(log N) search
  per node, no sequential recursion. Node AABBs come from range-min/max
  sparse tables (doubling), not a bottom-up atomic pass.
* **Traversal**: per-ray explicit stack inside `lax.while_loop`, vmapped
  over rays — XLA turns the per-ray control flow into masked lockstep
  execution (the SIMT reconvergence stack of the reference's simulator,
  abstract_hardware_model.h:1150, becomes lane masking).

Used for secondary/shadow rays and large triangle meshes; camera-ray
splatting uses the tile-binning path (gsrt/ops/tile_binning.py) which is
strictly faster for the primary-visibility workload.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gsrt.ops.morton import morton3d


class LBVH(NamedTuple):
    # internal nodes: N-1 rows (root = 0)
    left: jnp.ndarray        # [N-1] int32 child index
    right: jnp.ndarray       # [N-1] int32
    left_leaf: jnp.ndarray   # [N-1] bool — child indexes leaves, else nodes
    right_leaf: jnp.ndarray  # [N-1] bool
    node_min: jnp.ndarray    # [N-1, 3]
    node_max: jnp.ndarray    # [N-1, 3]
    leaf_prim: jnp.ndarray   # [N] int32 — original primitive id per leaf
    leaf_min: jnp.ndarray    # [N, 3]
    leaf_max: jnp.ndarray    # [N, 3]

    @property
    def n_leaves(self) -> int:
        return self.leaf_prim.shape[0]


def _delta(codes, i, j, n):
    """Common-prefix length of (augmented) Morton keys i, j; −1 out of
    range. Duplicate codes fall back to index bits (Karras §4)."""
    valid = (j >= 0) & (j < n)
    j_c = jnp.clip(j, 0, n - 1)
    x = codes[i] ^ codes[j_c]
    idx_bits = i.astype(jnp.uint32) ^ j_c.astype(jnp.uint32)
    d = jnp.where(x == 0,
                  32 + jax.lax.clz(idx_bits).astype(jnp.int32),
                  jax.lax.clz(x).astype(jnp.int32))
    return jnp.where(valid, d, -1)


def build_lbvh(aabb_min: jnp.ndarray, aabb_max: jnp.ndarray) -> LBVH:
    """Build over [N,3] primitive AABBs. N must be ≥ 2."""
    n = aabb_min.shape[0]
    centers = 0.5 * (aabb_min + aabb_max)
    codes = morton3d(centers)
    order = jnp.argsort(codes)
    codes = codes[order].astype(jnp.uint32)
    lmin = aabb_min[order]
    lmax = aabb_max[order]

    i = jnp.arange(n - 1, dtype=jnp.int32)

    def delta(a, b):
        return _delta(codes, a, b, n)

    # direction of the range
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # upper bound on range length by doubling (30-bit codes + 32 index bits
    # → prefix ≤ 64, range ≤ n: 32 doublings suffice)
    def ub_body(_, lmax_):
        cond = (delta(i, i + lmax_ * d) > delta_min) & (lmax_ < 2 * n)
        return jnp.where(cond, lmax_ * 2, lmax_)

    l_max = jax.lax.fori_loop(0, 32, ub_body, jnp.full_like(i, 2))

    # binary search exact length l
    def len_body(k, carry):
        l, t = carry
        t = jnp.maximum(t // 2, 1)
        cond = delta(i, i + (l + t) * d) > delta_min
        l = jnp.where(cond, l + t, l)
        return l, t

    l, _ = jax.lax.fori_loop(
        0, 32, len_body, (jnp.zeros_like(i), l_max))
    j = i + l * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # split position: largest gamma in [first, last) with
    # delta(first, gamma+1) > delta(first, last)... standard Karras split
    delta_node = delta(i, j)

    def split_body(k, carry):
        s, t, div = carry
        t = -(-l // div)                     # ceil(l / 2^k)
        cond = delta(i, i + (s + t) * d) > delta_node
        s = jnp.where((t >= 1) & cond, s + t, s)
        return s, t, div * 2

    s, _, _ = jax.lax.fori_loop(
        0, 32, split_body,
        (jnp.zeros_like(i), jnp.zeros_like(i), jnp.full_like(i, 2)))
    gamma = i + s * d + jnp.minimum(d, 0)

    left = gamma
    right = gamma + 1
    left_leaf = first == gamma
    right_leaf = last == gamma + 1

    # node AABBs: range min/max over leaves [first, last] via sparse tables
    levels = max(1, (n - 1).bit_length())
    mins = [lmin]
    maxs = [lmax]
    for k in range(levels):
        w = 1 << k
        prev_min, prev_max = mins[-1], maxs[-1]
        shifted_min = jnp.concatenate(
            [prev_min[w:], jnp.full((min(w, n), 3), jnp.inf)], 0)[:n]
        shifted_max = jnp.concatenate(
            [prev_max[w:], jnp.full((min(w, n), 3), -jnp.inf)], 0)[:n]
        mins.append(jnp.minimum(prev_min, shifted_min))
        maxs.append(jnp.maximum(prev_max, shifted_max))
    mins_t = jnp.stack(mins)                 # [levels+1, N, 3]
    maxs_t = jnp.stack(maxs)

    length = last - first + 1
    k = jnp.floor(jnp.log2(jnp.maximum(length.astype(jnp.float32), 1.0))
                  ).astype(jnp.int32)
    k = jnp.clip(k, 0, levels)
    tail = jnp.maximum(last + 1 - (1 << k), first)
    node_min = jnp.minimum(mins_t[k, first], mins_t[k, tail])
    node_max = jnp.maximum(maxs_t[k, first], maxs_t[k, tail])

    return LBVH(left=left, right=right,
                left_leaf=left_leaf, right_leaf=right_leaf,
                node_min=node_min, node_max=node_max,
                leaf_prim=order.astype(jnp.int32),
                leaf_min=lmin, leaf_max=lmax)


def _ray_aabb(orig, inv_d, bmin, bmax, t_min, t_max):
    """Slab test (the reference's ray_box_test, vulkan_ray_tracing.cc:217)."""
    lo = (bmin - orig) * inv_d
    hi = (bmax - orig) * inv_d
    t_near = jnp.max(jnp.minimum(lo, hi), axis=-1)
    t_far = jnp.min(jnp.maximum(lo, hi), axis=-1)
    return (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)


def bvh_traverse(bvh: LBVH, orig, dirn, t_min, t_max,
                 leaf_fn: Callable, init_payload,
                 stack_depth: int = 64, any_hit: bool = False):
    """Generic stack traversal, vmapped over rays.

    leaf_fn(prim_id, ray_orig, ray_dir, t_min, best_t, payload) →
    (new_best_t, new_payload); called for every leaf whose AABB the ray
    enters. Returns (best_t [R], payload pytree, nodes_visited [R]).
    """
    n_nodes = bvh.left.shape[0]

    def one_ray(o, di, payload0):
        inv_d = 1.0 / jnp.where(jnp.abs(di) > 1e-12, di,
                                jnp.where(di >= 0, 1e-12, -1e-12))
        stack = jnp.zeros((stack_depth,), jnp.int32)
        # encoded entries: +1 bias; negative = leaf index −(leaf+1)

        def cond(state):
            sp, best_t = state[0], state[1]
            go = sp > 0
            if any_hit:  # stop at the first hit (best_t dropped below t_max)
                go = go & (best_t >= jnp.asarray(t_max))
            return go

        def body(state):
            sp, best_t, payload, visited, stack = state
            entry = stack[sp - 1]
            sp = sp - 1
            visited = visited + 1

            def handle_leaf(args):
                sp, best_t, payload, stack = args
                leaf = -entry - 1
                prim = bvh.leaf_prim[leaf]
                hit_box = _ray_aabb(o, inv_d, bvh.leaf_min[leaf],
                                    bvh.leaf_max[leaf], t_min, best_t)
                new_t, new_p = leaf_fn(prim, o, di, t_min, best_t, payload)
                best_t = jnp.where(hit_box, new_t, best_t)
                payload = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(hit_box, b, a), payload, new_p)
                return sp, best_t, payload, stack

            def handle_node(args):
                sp, best_t, payload, stack = args
                node = entry
                hit = _ray_aabb(o, inv_d, bvh.node_min[node],
                                bvh.node_max[node], t_min, best_t)

                def push(sp, stack, child, is_leaf):
                    enc = jnp.where(is_leaf, -(child + 1), child)
                    stack = stack.at[sp].set(enc)
                    return sp + 1, stack

                def do_push(args):
                    sp, stack = args
                    sp, stack = push(sp, stack, bvh.left[node],
                                     bvh.left_leaf[node])
                    sp, stack = push(sp, stack, bvh.right[node],
                                     bvh.right_leaf[node])
                    return sp, stack

                sp, stack = jax.lax.cond(
                    hit & (sp + 2 <= stack_depth), do_push,
                    lambda a: a, (sp, stack))
                return sp, best_t, payload, stack

            is_leaf_entry = entry < 0
            sp, best_t, payload, stack = jax.lax.cond(
                is_leaf_entry, handle_leaf, handle_node,
                (sp, best_t, payload, stack))
            return sp, best_t, payload, visited, stack

        # push root (node 0) — valid only when there ARE internal nodes
        stack = stack.at[0].set(0)
        state = (jnp.int32(1), jnp.asarray(t_max), payload0,
                 jnp.int32(0), stack)
        sp, best_t, payload, visited, _ = jax.lax.while_loop(
            cond, body, state)
        return best_t, payload, visited

    return jax.vmap(one_ray, in_axes=(0, 0, None))(orig, dirn, init_payload)
