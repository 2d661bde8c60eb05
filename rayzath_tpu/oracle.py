"""NumPy oracle integrator — the trusted reference implementation.

The analog of the reference's CPU engine (SURVEY.md §2.4: the CPU kernel
re-implements the CUDA integrator and serves as its correctness oracle,
cpu_engine_kernel.cpp:15-866). This is an independent NumPy implementation of
the SAME bounce semantics as engine/integrator.py (the "GPU semantics":
Beer's law, scattering media, uber-BSDF, NEE+MIS) that:

* uses classic Moller-Trumbore brute force (NOT the projection method) — so a
  projection/BVH bug shows up as a parity mismatch;
* consumes the SAME uniform streams (the caller passes the per-pass uniforms
  drawn from the counter-based keys), so paths are decision-for-decision
  comparable with the JAX integrator and images match to float tolerance.

No jax imports — pure NumPy.
"""
from __future__ import annotations

import numpy as np

BIG = 3.402823466e38
DET_EPS = 1e-7
WORLD_MATERIAL_ID = 0
PATH_LIMIT = 255
NO_MAP = -1


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def _normalize(v):
    return v / np.sqrt(np.maximum(_dot(v, v), 1e-20))[..., None]


def _local_frame(vn):
    b = (np.abs(vn[..., 0]) > np.abs(vn[..., 1])).astype(vn.dtype)
    vx0 = np.stack([1.0 - b, b, np.zeros_like(b)], axis=-1)
    vy = np.cross(vn, vx0)
    vx = np.cross(vn, vy)
    return vx, vy


def _cosine_hemisphere(r1, r2, vn):
    vx, vy = _local_frame(vn)
    phi = r1 * 2 * np.pi
    sq = np.sqrt(r2)
    return (vx * (sq * np.cos(phi))[..., None]
            + vy * (sq * np.sin(phi))[..., None]
            + vn * np.sqrt(np.maximum(1.0 - r2, 0.0))[..., None])


def _sample_sphere(r1, r2, vn):
    vx, vy = _local_frame(vn)
    phi = r1 * 2 * np.pi
    ct = 1.0 - 2.0 * r2
    st = np.sqrt(np.maximum(1.0 - ct * ct, 1e-12))
    return (vx * (st * np.cos(phi))[..., None]
            + vy * (st * np.sin(phi))[..., None] + vn * ct[..., None])


def _sample_hemisphere(r1, r2, vn):
    return _sample_sphere(r1, r2 * 0.5, vn)


def _sample_disk(r1, r2, vn, radius):
    vx, vy = _local_frame(vn)
    ang = r1 * 2 * np.pi
    rad = np.sqrt(r2) * radius
    return vx * (np.sin(ang) * rad)[..., None] + vy * (np.cos(ang) * rad)[..., None]


def _reflect(vi, vn):
    return vi - 2.0 * _dot(vn, vi)[..., None] * vn


def _fresnel(vn, vi, n1, n2):
    ratio = n1 / np.maximum(n2, 1e-20)
    cosi = np.abs(_dot(vi, vn))
    sin2_t = ratio * ratio * (1.0 - cosi * cosi)
    tir = sin2_t >= 1.0
    cost = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
    rp = (n1 * cosi - n2 * cost) / np.maximum(n1 * cosi + n2 * cost, 1e-20)
    rs = (n2 * cosi - n1 * cost) / np.maximum(n2 * cosi + n1 * cost, 1e-20)
    f = np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return f, ratio, ratio * cosi - cost


def mt_closest(o, d, near, far, v0, e1, e2):
    """Classic Moller-Trumbore brute force (reference
    cuda_render_parts.cuh:1023-1083). Returns (t, id, b1, b2, external)."""
    pvec = np.cross(d[:, None, :], e2[None])
    det = _dot(e1[None], pvec)
    det = det + np.where(np.abs(det) < DET_EPS, DET_EPS, 0.0)
    inv = 1.0 / det
    tvec = o[:, None, :] - v0[None]
    b1 = _dot(tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None])
    b2 = _dot(d[:, None, :], qvec) * inv
    t = _dot(e2[None], qvec) * inv
    valid = ((b1 >= 0) & (b1 <= 1) & (b2 >= 0) & (b1 + b2 <= 1)
             & (t > near[:, None]) & (t < far[:, None]))
    t = np.where(valid, t, BIG)
    k = np.argmin(t, axis=1)
    rows = np.arange(len(o))
    tk = t[rows, k]
    hit = tk < BIG
    tid = np.where(hit, k, -1).astype(np.int32)
    return (np.where(hit, tk, far), tid,
            np.where(hit, b1[rows, k], 0.0), np.where(hit, b2[rows, k], 0.0),
            np.where(hit, det[rows, k] > 0, True))


def fetch_map(scene, map_id, uv):
    """NumPy twin of ops/texture.fetch (UV transform, v flip, point/bilinear,
    wrap/clamp/mirror/border, color + scalar atlases). [R] ids, [R,2] uv ->
    [R,4]."""
    mid = np.maximum(map_id, 0)
    prm = scene.map_uv[mid]
    u = uv[..., 0] + prm[..., 3]
    v = uv[..., 1] + prm[..., 4]
    c, s = np.cos(prm[..., 2]), np.sin(prm[..., 2])
    u, v = (u * c - v * s) * prm[..., 0], (u * s + v * c) * prm[..., 1]
    flags = scene.map_flags[mid]
    filt, addr, which = flags[..., 0], flags[..., 1], flags[..., 2]
    rect = scene.map_rect[mid]
    y0, x0, h, w = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]

    def address(x):
        wrap = np.mod(x, 1.0)
        clamp = np.clip(x, 0.0, 1.0 - 1e-6)
        period = np.mod(x, 2.0)
        mirror = np.clip(np.where(period > 1.0, 2.0 - period, period),
                         0.0, 1.0 - 1e-6)
        coord = np.where(addr == 0, wrap,
                         np.where(addr == 1, clamp,
                                  np.where(addr == 2, mirror, clamp)))
        return coord, (addr == 3) & ((x < 0.0) | (x >= 1.0))

    un, ub = address(u)
    vn, vb = address(v)
    vn = 1.0 - vn
    is_border = ub | vb
    wf, hf = w.astype(np.float32), h.astype(np.float32)

    def gather(px, py):
        px = np.clip(px, 0, w - 1) + x0
        py = np.clip(py, 0, h - 1) + y0
        # a map lives in only ONE atlas; clamp indices into the other
        # (XLA gathers clamp implicitly; NumPy must do it explicitly)
        ca = scene.color_atlas
        sa = scene.scalar_atlas
        cv = ca[np.clip(py, 0, ca.shape[0] - 1),
                np.clip(px, 0, ca.shape[1] - 1)]
        sv = sa[np.clip(py, 0, sa.shape[0] - 1),
                np.clip(px, 0, sa.shape[1] - 1)]
        return np.where((which == 0)[..., None], cv,
                        np.broadcast_to(sv[..., None], sv.shape + (4,)))

    point_val = gather(np.floor(un * wf).astype(np.int32),
                       np.floor(vn * hf).astype(np.int32))
    fx, fy = un * wf - 0.5, vn * hf - 0.5
    x_lo, y_lo = np.floor(fx).astype(np.int32), np.floor(fy).astype(np.int32)
    ax = (fx - x_lo)[..., None]
    ay = (fy - y_lo)[..., None]
    lin = ((gather(x_lo, y_lo) * (1 - ax) + gather(x_lo + 1, y_lo) * ax)
           * (1 - ay)
           + (gather(x_lo, y_lo + 1) * (1 - ax)
              + gather(x_lo + 1, y_lo + 1) * ax) * ay)
    out = np.where((filt == 0)[..., None], point_val, lin)
    return np.where(is_border[..., None], 0.0, out)


def texture_shadow(scene, o, d, dist):
    """Texture part of the shadow mask over the cutout set (reference
    per-hit opacityColor(texcrd) texture term, cuda_instance.cuh:92-164)."""
    v0, e1, e2 = scene.cut_v0, scene.cut_e1, scene.cut_e2
    pvec = np.cross(d[:, None, :], e2[None])
    det = _dot(e1[None], pvec)
    det = det + np.where(np.abs(det) < DET_EPS, DET_EPS, 0.0)
    inv = 1.0 / det
    tvec = o[:, None, :] - v0[None]
    b1 = _dot(tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None])
    b2 = _dot(d[:, None, :], qvec) * inv
    t = _dot(e2[None], qvec) * inv
    valid = ((b1 >= 0) & (b1 <= 1) & (b2 >= 0) & (b1 + b2 <= 1)
             & (t > 0) & (t < dist[:, None]))                   # [R, C]
    uv = (scene.cut_t0[None] + b1[..., None] * (scene.cut_t1 - scene.cut_t0)[None]
          + b2[..., None] * (scene.cut_t2 - scene.cut_t0)[None])
    mid = np.broadcast_to(scene.cut_map[None], valid.shape)
    tex = fetch_map(scene, mid.reshape(-1),
                    uv.reshape(-1, 2)).reshape(valid.shape + (4,))
    rgb = np.prod(np.where(valid[..., None], tex[..., :3], 1.0), axis=1)
    a = np.prod(np.where(valid, 1.0 - tex[..., 3], 1.0), axis=1)
    return rgb, a


def mt_shadow(o, d, dist, v0, e1, e2, op_rgb, op_a):
    pvec = np.cross(d[:, None, :], e2[None])
    det = _dot(e1[None], pvec)
    det = det + np.where(np.abs(det) < DET_EPS, DET_EPS, 0.0)
    inv = 1.0 / det
    tvec = o[:, None, :] - v0[None]
    b1 = _dot(tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None])
    b2 = _dot(d[:, None, :], qvec) * inv
    t = _dot(e2[None], qvec) * inv
    valid = ((b1 >= 0) & (b1 <= 1) & (b2 >= 0) & (b1 + b2 <= 1)
             & (t > 0) & (t < dist[:, None]))
    rgb = np.prod(np.where(valid[..., None], op_rgb[None], 1.0), axis=1)
    a = np.prod(np.where(valid, op_a[None], 1.0), axis=1)
    return rgb, a


class OracleScene:
    """NumPy view of a DeviceScene (converted once)."""

    def __init__(self, ds):
        for f in ("tri_v0", "tri_e1", "tri_e2", "tri_n0", "tri_n1", "tri_n2",
                  "tri_t0", "tri_t1", "tri_t2", "tri_mat", "tri_inst",
                  "mat_color", "mat_metalness", "mat_roughness", "mat_emission",
                  "mat_ior", "mat_scattering", "mat_maps",
                  "color_atlas", "scalar_atlas", "map_rect", "map_flags",
                  "map_uv",
                  "spot_pos", "spot_dir", "spot_color", "spot_size",
                  "spot_emission", "spot_cos_angle",
                  "dir_dir", "dir_color", "dir_emission", "dir_cos"):
            setattr(self, f, np.asarray(getattr(ds, f)))
        for f in ("cut_v0", "cut_e1", "cut_e2", "cut_t0", "cut_t1", "cut_t2",
                  "cut_map"):
            v = getattr(ds, f)
            setattr(self, f, None if v is None else np.asarray(v))
        self.n_triangles = ds.n_triangles
        self.n_materials = ds.n_materials
        self.n_spot_lights = ds.n_spot_lights
        self.n_direct_lights = ds.n_direct_lights
        self.has_maps = ds.has_maps
        self.n_cutout = ds.n_cutout


class OracleCamera:
    def __init__(self, dc):
        self.position = np.asarray(dc.position)
        self.rot = np.asarray(dc.rot)
        self.fov = float(dc.fov)
        self.near_far = np.asarray(dc.near_far)
        self.focal_distance = float(dc.focal_distance)
        self.aperture = float(dc.aperture)
        self.width = dc.width
        self.height = dc.height


def generate_rays(cam: OracleCamera, pixels, u):
    w, h = float(cam.width), float(cam.height)
    aspect = w / h
    tana = np.tan(cam.fov * 0.5)
    dx = ((pixels[:, 0] + 0.5) / w - 0.5) * tana
    dy = ((pixels[:, 1] + 0.5) / h - 0.5) * (-tana / aspect)
    dx = dx + (0.5 / w) * (u[:, 0] * 2.0 - 1.0)
    dy = dy + (0.5 / w) * (u[:, 1] * 2.0 - 1.0)
    direction = np.stack([dx, dy, np.ones_like(dx)], axis=1)
    focal_point = direction * cam.focal_distance
    ap_angle = u[:, 2] * 2 * np.pi
    ap_radius = np.sqrt(u[:, 3]) * cam.aperture
    origin = np.stack([ap_radius * np.sin(ap_angle),
                       ap_radius * np.cos(ap_angle),
                       np.zeros_like(ap_angle)], axis=1)
    direction = focal_point - origin
    origin = origin @ cam.rot.T + cam.position
    direction = _normalize(direction @ cam.rot.T)
    return origin, direction


def sky_texcrd(d):
    u = -(0.5 + np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi))
    v = 0.5 + np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi
    return np.stack([u, v], axis=1)


class OracleState:
    def __init__(self, width, height):
        r = width * height
        self.width, self.height = width, height
        self.accum = np.zeros((height, width, 4), np.float32)
        self.depth_buf = np.zeros((height, width), np.float32)
        self.origin = np.zeros((r, 3), np.float32)
        self.direction = np.tile(np.asarray([[0., 0., 1.]], np.float32), (r, 1))
        self.throughput = np.ones((r, 3), np.float32)
        self.medium = np.full(r, WORLD_MATERIAL_ID, np.int32)
        self.path_depth = np.full(r, PATH_LIMIT, np.int32)
        self.near = np.zeros(r, np.float32)
        self.far = np.full(r, BIG, np.float32)


def _brdf_eval(d_in, n, surf_scattering, roughness, alpha_op, reflectance, vpl):
    is_scatter = surf_scattering > 0.0
    n_dot_o = _dot(n, vpl)
    n_dot_i = _dot(n, -d_in)
    vh = _normalize(vpl - d_in)
    n_dot_h = _dot(n, vh)
    b = n_dot_h * n_dot_h * (roughness - 1.0) + 1.0001
    ndf = (roughness + 1e-5) / (b * b)

    def att(c):
        c = np.maximum(c, 0.0)
        return c / (c * (1.0 - roughness) + roughness + 1e-20)

    attenuation = att(n_dot_i) * att(n_dot_o)
    diffuse = n_dot_o * (alpha_op == 0.0)
    specular = ndf * attenuation / np.maximum(n_dot_i * n_dot_o, 1e-20)
    val = diffuse + (specular * n_dot_o - diffuse) * reflectance
    val = np.where((n_dot_o <= 0.0) | (n_dot_i <= 0.0), 0.0, val)
    return np.where(is_scatter, 1.0, val)


def bounce_step(scene: OracleScene, cam: OracleCamera, cfg, state: OracleState,
                u: np.ndarray) -> None:
    """One wavefront bounce, mutating state in place. ``u`` [R, n_streams] are
    the SAME uniforms the JAX integrator would draw for this pass."""
    H, W = state.height, state.width
    R = H * W
    o, d = state.origin, state.direction
    depth0 = state.path_depth
    near = np.where(depth0 == 0, cam.near_far[0], state.near)
    far = np.where(depth0 == 0, cam.near_far[1], state.far)

    med = np.clip(state.medium, 0, scene.n_materials - 1)
    med_color = scene.mat_color[med]
    med_scatter = scene.mat_scattering[med]
    med_ior = scene.mat_ior[med]

    scat_dist = -np.log(u[:, 0] + 1e-4) / np.maximum(med_scatter, 1e-20)
    has_scatter = med_scatter > 1e-4
    far_eff = np.where(has_scatter, np.minimum(far, scat_dist), far)

    t, tri_id, b1, b2, external = mt_closest(
        o, d, near, far_eff, scene.tri_v0, scene.tri_e1, scene.tri_e2)
    hit_obj = tri_id >= 0
    scatter_evt = has_scatter & ~hit_obj & (scat_dist < far)
    any_hit = hit_obj | scatter_evt
    t_final = np.where(hit_obj, t, np.where(scatter_evt, scat_dist, far_eff))

    tri = np.maximum(tri_id, 0)
    surf_mat = np.where(hit_obj, scene.tri_mat[tri],
                        np.where(scatter_evt, med, WORLD_MATERIAL_ID))
    behind_mat = np.where(hit_obj & external, surf_mat,
                          np.where(scatter_evt, med,
                                   np.full_like(surf_mat, WORLD_MATERIAL_ID)))

    b0 = 1.0 - b1 - b2
    texcrd_hit = (scene.tri_t0[tri] * b0[:, None] + scene.tri_t1[tri] * b1[:, None]
                  + scene.tri_t2[tri] * b2[:, None])
    texcrd = np.where(hit_obj[:, None], texcrd_hit,
                      np.where(scatter_evt[:, None], 0.0, sky_texcrd(d)))
    ext_f = np.where(external, 1.0, -1.0)[:, None]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    flat_n = _normalize(np.cross(e1, e2)) * ext_f
    vtx_n = _normalize(scene.tri_n0[tri] * b0[:, None]
                       + scene.tri_n1[tri] * b1[:, None]
                       + scene.tri_n2[tri] * b2[:, None])

    mid = np.clip(surf_mat, 0, scene.n_materials - 1)
    base = scene.mat_color[mid]
    mat_rgb = base[:, :3]
    alpha_op = 1.0 - base[:, 3]
    metalness = scene.mat_metalness[mid]
    roughness = scene.mat_roughness[mid]
    emission = scene.mat_emission[mid]

    # material maps (reference Material::color/metalness/... with maps,
    # cuda_material.cuh:70-123) — same semantics as integrator.material_fetch
    if scene.has_maps:
        maps = scene.mat_maps[mid]                         # [R,5]
        tex = fetch_map(scene, maps[:, 0], texcrd)
        has_t = (maps[:, 0] >= 0)
        mat_rgb = np.where(has_t[:, None], mat_rgb * tex[:, :3], mat_rgb)
        alpha_op = np.where(has_t, alpha_op * (1.0 - tex[:, 3]), alpha_op)
        met_v = fetch_map(scene, maps[:, 2], texcrd)[:, 0]
        metalness = np.where(maps[:, 2] >= 0, met_v, metalness)
        rgh_v = fetch_map(scene, maps[:, 3], texcrd)[:, 0]
        roughness = np.where(maps[:, 3] >= 0, rgh_v, roughness)
        emi_v = fetch_map(scene, maps[:, 4], texcrd)[:, 0]
        emission = np.where(maps[:, 4] >= 0, emission * emi_v, emission)

    # tangent-space normal mapping (reference Triangle::mapNormal,
    # cuda_render_parts.cuh:1095-1116)
    mapped = vtx_n
    if scene.has_maps:
        nm_id = scene.mat_maps[mid][:, 1]
        has_nm = nm_id >= 0
        nm_rgb = fetch_map(scene, nm_id, texcrd)[:, :3]
        tt0, tt1, tt2 = (scene.tri_t0[tri], scene.tri_t1[tri],
                         scene.tri_t2[tri])
        duv1 = tt1 - tt0
        duv2 = tt2 - tt0
        denom = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
        f = 1.0 / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        tangent = _normalize((e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2])
                             * f[:, None])
        tangent = _normalize(tangent
                             - mapped * _dot(tangent, mapped)[:, None])
        bitangent = np.cross(tangent, mapped)
        mn = nm_rgb * 2.0 - 1.0
        perturbed = _normalize(mapped * mn[:, 2:3] + tangent * mn[:, 0:1]
                               + bitangent * mn[:, 1:2])
        mapped = np.where(has_nm[:, None], perturbed, mapped)
    mapped = mapped * ext_f

    normal = np.where(hit_obj[:, None], flat_n, d)
    mapped_normal = np.where(hit_obj[:, None], mapped, d)

    med_alpha_op = 1.0 - med_color[:, 3]
    throughput = (state.throughput * med_color[:, :3]
                  * np.power(np.maximum(med_alpha_op, 1e-6), t_final)[:, None])

    contrib = np.where((emission > 0.0)[:, None],
                       throughput * mat_rgb * emission[:, None], 0.0)

    new_depth = np.where(any_hit, depth0 + 1, PATH_LIMIT)

    n2 = scene.mat_ior[np.clip(behind_mat, 0, scene.n_materials - 1)]
    fresnel, refr_ratio, refr_b = _fresnel(mapped_normal, d, med_ior, n2)
    reflectance = fresnel + (1.0 - fresnel) * metalness

    surf_scattering = scene.mat_scattering[mid]

    # sample_direction (cuda_material.cuh:203-301)
    u_r1, u_r2, u_lottery = u[:, 1], u[:, 2], u[:, 3]

    def flip_above(v, n):
        c = _dot(n, v)[..., None]
        return np.where(c < 0.0, v - 2.0 * c * n, v)

    scatter_dir = _sample_sphere(u_r1, u_r2, d)
    refr_dir = d * refr_ratio[:, None] + mapped_normal * refr_b[:, None]
    refl_m = flip_above(_reflect(d, mapped_normal), normal)
    take_refr = fresnel < u_lottery
    trans_dir = np.where(take_refr[:, None], refr_dir, refl_m)
    trans_tint = np.where(take_refr, 1.0, metalness)
    diff_dir = flip_above(_cosine_hemisphere(u_r1, u_r2, mapped_normal), normal)
    vh = _sample_hemisphere(u_r1, 1.0 - np.power(u_r2 + 1e-5, roughness),
                            mapped_normal)
    gloss_dir = flip_above(_reflect(d, vh), normal)

    is_trans = alpha_op > 0.0
    is_scat = is_trans & (surf_scattering > 0.0)
    is_diffuse = ~is_trans & (u_lottery > reflectance)
    next_dir = np.where(is_scat[:, None], scatter_dir,
                        np.where(is_trans[:, None], trans_dir,
                                 np.where(is_diffuse[:, None], diff_dir, gloss_dir)))
    next_dir = _normalize(next_dir)
    tint = np.where(is_scat, metalness,
                    np.where(is_trans, trans_tint,
                             np.where(is_diffuse, 1.0, metalness)))
    refracted = is_trans & ~is_scat & take_refr

    nudge_n = np.where(refracted[:, None], -normal, normal)
    point = o + d * t_final[:, None] + nudge_n * (1e-4 * t_final)[:, None]

    # NEE
    if scene.n_spot_lights or scene.n_direct_lights:
        vs_pdf = _brdf_eval(d, mapped_normal, surf_scattering, roughness,
                            alpha_op, reflectance, next_dir)
        brdf_color = mat_rgb + (1.0 - mat_rgb) * reflectance[:, None]
        direct = np.zeros_like(point)
        op_rgb = scene.mat_color[scene.tri_mat][:, :3]
        op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]
        off = 8
        for s in range(cfg.light_sampling.spot_light if scene.n_spot_lights else 0):
            us = u[:, off + 3 * s: off + 3 * s + 3]
            nl = scene.n_spot_lights
            li = np.minimum((us[:, 0] * nl).astype(np.int32), nl - 1)
            lpos, ldir = scene.spot_pos[li], scene.spot_dir[li]
            lcol, lsize = scene.spot_color[li], scene.spot_size[li]
            lemit, lcos = scene.spot_emission[li], scene.spot_cos_angle[li]
            v_pl0 = lpos - point
            d_pl0 = np.sqrt(np.maximum(_dot(v_pl0, v_pl0), 1e-20))
            vop_dot = _dot(v_pl0, next_dir)
            d_pq = np.sqrt(np.maximum(d_pl0 ** 2 - vop_dot ** 2, 0.0))
            would_hit = (d_pq < lsize) & (vop_dot > 0.0)
            d_oq = np.sqrt(np.maximum(d_pl0 ** 2 - d_pq ** 2, 0.0))
            vpl_hit = next_dir * np.maximum(d_oq, 1e-4)[:, None]
            vpl_disk = _sample_disk(us[:, 1], us[:, 2], v_pl0 / d_pl0[:, None],
                                    lsize) + v_pl0
            vpl = np.where(would_hit[:, None], vpl_hit, vpl_disk)
            se = np.where(would_hit, lemit, 0.0)
            d_pl = np.sqrt(np.maximum(_dot(vpl, vpl), 1e-20))
            vpl_n = vpl / d_pl[:, None]
            brdf = _brdf_eval(d, mapped_normal, surf_scattering, roughness,
                              alpha_op, reflectance, vpl_n)
            solid_angle = (lsize ** 2 * np.pi) / ((d_pl + 1.0) ** 2)
            sctr = np.exp(-d_pl * med_scatter)
            beam = (lcos < _dot(-vpl_n, ldir)).astype(np.float32)
            l_pdf = 1.0 / np.maximum(solid_angle, 1e-20)
            vsw = vs_pdf / (vs_pdf + l_pdf)
            le = lemit * solid_angle * brdf
            radiance = (le * (1 - vsw) + se * vsw) * sctr * beam
            radiance = np.where(radiance < 1e-4, 0.0, radiance)
            radiance = np.where(brdf < 1e-4, 0.0, radiance)
            v_rgb, v_a = mt_shadow(point, vpl_n, d_pl, scene.tri_v0,
                                   scene.tri_e1, scene.tri_e2, op_rgb, op_a)
            if scene.n_cutout:
                tx_rgb, tx_a = texture_shadow(scene, point, vpl_n, d_pl)
                v_rgb, v_a = v_rgb * tx_rgb, v_a * tx_a
            direct = direct + (lcol * brdf_color * (radiance * v_a)[:, None]
                               * v_rgb) / (cfg.light_sampling.spot_light
                                           / float(scene.n_spot_lights))
        if scene.n_spot_lights:
            off = 8 + 3 * cfg.light_sampling.spot_light
        for s in range(cfg.light_sampling.direct_light if scene.n_direct_lights else 0):
            us = u[:, off + 3 * s: off + 3 * s + 3]
            nl = scene.n_direct_lights
            li = np.minimum((us[:, 0] * nl).astype(np.int32), nl - 1)
            ldir, lcol = scene.dir_dir[li], scene.dir_color[li]
            lemit, lcos = scene.dir_emission[li], scene.dir_cos[li]
            would_hit = _dot(next_dir, -ldir) > lcos
            cone = _sample_sphere(us[:, 1], us[:, 2] * 0.5 * (1.0 - lcos), -ldir)
            vpl = np.where(would_hit[:, None], next_dir, cone)
            se = np.where(would_hit, lemit, 0.0)
            vpl_n = _normalize(vpl)
            brdf = _brdf_eval(d, mapped_normal, surf_scattering, roughness,
                              alpha_op, reflectance, vpl_n)
            solid_angle = 2.0 * np.pi * (1.0 - lcos)
            l_pdf = 1.0 / np.maximum(solid_angle, 1e-20)
            vsw = vs_pdf / (vs_pdf + l_pdf)
            le = lemit * solid_angle * brdf
            radiance = le * (1 - vsw) + se * vsw
            radiance = np.where(radiance < 1e-4, 0.0, radiance)
            dist_big = np.full(R, BIG, np.float32)
            v_rgb, v_a = mt_shadow(point, vpl_n, dist_big,
                                   scene.tri_v0, scene.tri_e1, scene.tri_e2,
                                   op_rgb, op_a)
            if scene.n_cutout:
                tx_rgb, tx_a = texture_shadow(scene, point, vpl_n, dist_big)
                v_rgb, v_a = v_rgb * tx_rgb, v_a * tx_a
            direct = direct + (lcol * brdf_color * (radiance * v_a)[:, None]
                               * v_rgb) / (cfg.light_sampling.direct_light
                                           / float(scene.n_direct_lights))
        metallic_tint = 1.0 + (mat_rgb - 1.0) * metalness[:, None]
        contrib = contrib + np.where(any_hit[:, None],
                                     direct * throughput * metallic_tint, 0.0)

    throughput_next = throughput + (throughput * mat_rgb - throughput) * tint[:, None]

    path_continues = new_depth < cfg.tracing.max_depth
    terminated = ~path_continues
    state.accum[:, :, :3] += contrib.reshape(H, W, 3)
    state.accum[:, :, 3] += terminated.reshape(H, W).astype(np.float32)

    cam_seg = (depth0 == 0).reshape(H, W)
    state.depth_buf = np.where(cam_seg, t_final.reshape(H, W), state.depth_buf)

    new_medium = np.where(refracted, behind_mat, med)
    y, x = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    pix = np.stack([x.ravel(), y.ravel()], axis=1)
    cam_o, cam_d = generate_rays(cam, pix, u[:, 4:8])

    tm = terminated[:, None]
    state.origin = np.where(tm, cam_o, point).astype(np.float32)
    state.direction = np.where(tm, cam_d, next_dir).astype(np.float32)
    state.throughput = np.where(tm, 1.0, throughput_next).astype(np.float32)
    state.medium = np.where(terminated, WORLD_MATERIAL_ID, new_medium).astype(np.int32)
    state.path_depth = np.where(terminated, 0, new_depth).astype(np.int32)
    state.near = np.where(terminated, cam.near_far[0], 0.0).astype(np.float32)
    state.far = np.where(terminated, cam.near_far[1], BIG).astype(np.float32)
