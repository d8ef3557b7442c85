"""Reference-faithful scalar oracle: the wgpu reference's estimator,
transcribed per-pixel into NumPy/Python scalars.

This is THE ground truth for the fidelity contract ("per-pixel radiance
matches the wgpu reference within MC noise", BASELINE.md): a direct
per-pixel transcription of ref: src/kernels/mega_kernel.wgsl:984-1022
(cs_main), :865-982 (recursive_trace), :745-861 (trace_photon) and every
helper they call, with the reference's exact SINGLE RNG STREAM — seeded
`seed + 1203793*x + 7*y` (:991) and flowing from the camera path straight
into the photon pass (:998-1015), which tpurt deliberately replaces with
per-phase streams. Reference quirks are reproduced on purpose:

  * camera rays are NOT normalized (get_ray :267-275), so the smooth
    dielectric's `cos_theta = dot(wo, normal)` can exceed 1 on the first
    bounce (:919);
  * the camera path uses the BASE ior (no Cauchy, :915) while photons and
    shadow rays use cauchy_ior (:797, :530);
  * `fr_dielectric(abs(cos), eta)` treats exits as entries (:920);
  * vispoint wo is stored unnormalized (:897) and evaluate_bsdf feeds it
    to oren_nayar_f raw (:727);
  * point-light cone sampling draws 3 floats but uses 2 (:715-719);
  * sky is black but still adds throughput*0 (:617-620, :881);
  * the photon GGX pdf is tr_lambda+1 (:831, :845) — not the VNDF pdf the
    camera path uses (:950-951).

Scalar u32 PCG RXS-M-XS arithmetic is exact (Python ints mod 2^32,
ref :655-660); geometry runs in float64 — the estimator is unbiased in
either precision and the tests compare within MC bounds, not bitwise.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

EPS = 1e-5                 # wgsl :95
VISIBLE_MIN = 380.0        # wgsl :96
VISIBLE_RANGE = 400.0      # wgsl :97
PI = math.pi
DISPERSION_B = 0.004       # wgsl :100
K_PHOTONS = 4              # wgsl :101
MAX_PHOTON_BOUNCES = 8     # wgsl :102
PHOTON_CONE_COS = 0.707    # wgsl :103

M32 = 0xFFFFFFFF
_INV = np.float32(1.0) / np.float32(np.float32(0xFFFFFFFF))  # == 2^-32


class Rng:
    """PCG RXS-M-XS 32/32 (ref: mega_kernel.wgsl:655-660) — bit-exact."""

    __slots__ = ("state",)

    def __init__(self, state: int):
        self.state = state & M32

    def rand(self) -> int:
        old = self.state
        res = (((old >> ((old >> 28) + 4)) ^ old) * 277803737) & M32
        self.state = (old * 747796405 + 2891336453) & M32
        return (res >> 22) ^ res

    def f1(self) -> float:
        # f32(u32) * (1 / f32(0xFFFFFFFF)) (ref :662-664)
        return float(np.float32(self.rand()) * _INV)

    def f2(self):
        return self.f1(), self.f1()


def _v(x, y, z):
    return np.array([x, y, z], np.float64)


def normalize(v):
    return v / max(np.linalg.norm(v), 1e-300)


# ----- spectral (ref :434-458, spectrum.rs tables shared with tpurt) -----

def _cie_tables():
    from tpurt.ops.spectra import CIE_X, CIE_Y, CIE_Z
    return (np.asarray(CIE_X, np.float64), np.asarray(CIE_Y, np.float64),
            np.asarray(CIE_Z, np.float64))


_CX, _CY, _CZ = None, None, None


def cie_to_rgb(lam):
    """ref :444-458 (piecewise-linear CIE lookup + XYZ->sRGB)."""
    global _CX, _CY, _CZ
    if _CX is None:
        _CX, _CY, _CZ = _cie_tables()
    t = (lam - VISIBLE_MIN) / 5.0
    i = int(t)
    f = t - i
    a = min(i, 80)
    b = min(i + 1, 80)
    x = _CX[a] * (1 - f) + _CX[b] * f
    y = _CY[a] * (1 - f) + _CY[b] * f
    z = _CZ[a] * (1 - f) + _CZ[b] * f
    return _v(3.2404542 * x - 1.5371385 * y - 0.4985314 * z,
              -0.9692660 * x + 1.8760108 * y + 0.0415560 * z,
              0.0556434 * x - 0.2040259 * y + 1.0572252 * z)


def blackbody(lam_nm, temp):
    """ref :434-442 (Planck * 1e-14)."""
    h, c, k = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    c1 = 2.0 * h * c * c
    c2 = h * c / k
    l = lam_nm * 1e-9
    return c1 / (l ** 5 * (math.exp(c2 / (l * temp)) - 1.0)) * 1e-14


def cauchy_ior(base_ior, lam_nm):
    """ref :260-263."""
    um = lam_nm * 1e-3
    return base_ior + DISPERSION_B / (um * um)


# ----- BSDF helpers (ref :166-256, :624-651) -----

def oren_nayar_f(wo, wi, n, albedo, sigma):
    """ref :182-209."""
    ndotv = max(np.dot(n, wo), 0.0)
    ndotl = max(np.dot(n, wi), 0.0)
    if ndotv < 1e-6 or ndotl < 1e-6:
        return np.zeros(3)
    sig2 = sigma * sigma
    A = 1.0 - 0.5 * sig2 / (sig2 + 0.33)
    B = 0.45 * sig2 / (sig2 + 0.09)
    sin2_v = max(0.0, 1.0 - ndotv * ndotv)
    sin2_l = max(0.0, 1.0 - ndotl * ndotl)
    sin_v = math.sqrt(sin2_v)
    sin_l = math.sqrt(sin2_l)
    if sin_v > 1e-6 and sin_l > 1e-6:
        wo_t = wo - ndotv * n
        wi_t = wi - ndotl * n
        cos_phi_diff = np.clip(np.dot(wo_t, wi_t) / (sin_v * sin_l), -1, 1)
    else:
        cos_phi_diff = 1.0
    sin_alpha = max(sin_v, sin_l)
    tan_beta = min(sin_v, sin_l) / max(ndotv, ndotl)
    return albedo / PI * (A + B * max(0.0, cos_phi_diff) * sin_alpha * tan_beta)


def tan2_theta(w):
    c2 = w[2] * w[2]
    if c2 < 1e-10:
        return 1e20
    return (1.0 - c2) / c2


def tr_d(wm, alpha):
    t2 = tan2_theta(wm)
    if t2 > 1e20:
        return 0.0
    cos4 = (wm[2] * wm[2]) ** 2
    e = t2 / (alpha * alpha)
    return 1.0 / (PI * alpha * alpha * cos4 * (1.0 + e) * (1.0 + e))


def tr_lambda(w, alpha):
    t2 = tan2_theta(w)
    if t2 > 1e20:
        return 0.0
    return (math.sqrt(1.0 + alpha * alpha * t2) - 1.0) * 0.5


def tr_g(wo, wi, alpha):
    return 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))


def tr_sample_wm(wo, u, alpha):
    """ref :235-256 (VNDF sample in the local frame)."""
    wh = normalize(_v(alpha * wo[0], alpha * wo[1], wo[2]))
    if wh[2] < 0.0:
        wh = -wh
    if abs(wh[2]) > 0.99999:
        t1 = _v(1.0, 0.0, 0.0)
    else:
        t1 = normalize(np.cross(_v(0.0, 0.0, 1.0), wh))
    t2 = np.cross(wh, t1)
    r = math.sqrt(u[1])
    phi = 2.0 * PI * u[0]
    px = r * math.cos(phi)
    py = r * math.sin(phi)
    h = math.sqrt(max(0.0, 1.0 - px * px))
    s = (1.0 + wh[2]) * 0.5
    py = h * (1.0 - s) + py * s
    pz = math.sqrt(max(0.0, 1.0 - px * px - py * py))
    nh = px * t1 + py * t2 + pz * wh
    return normalize(_v(alpha * nh[0], alpha * nh[1], max(nh[2], 1e-6)))


def fr_dielectric(cos_theta_i, eta):
    """ref :624-635."""
    ct = min(max(cos_theta_i, -1.0), 1.0)
    e = eta
    if ct < 0.0:
        e = 1.0 / eta
        ct = -ct
    sin2_ti = 1.0 - ct * ct
    sin2_tt = sin2_ti / (e * e)
    if sin2_tt >= 1.0:
        return 1.0
    ct_t = math.sqrt(1.0 - sin2_tt)
    r_parl = (e * ct - ct_t) / (e * ct + ct_t)
    r_perp = (ct - e * ct_t) / (ct + e * ct_t)
    return (r_parl * r_parl + r_perp * r_perp) * 0.5


def reflect_dir(wo, n):
    return -wo + 2.0 * np.dot(wo, n) * n


def refract_dir(wo, n, eta):
    """ref :641-651 (returns 0-vector on TIR)."""
    ct = np.dot(n, wo)
    e = eta
    na = n
    if ct < 0.0:
        e = 1.0 / eta
        ct = -ct
        na = -n
    sin2_ti = max(0.0, 1.0 - ct * ct)
    sin2_tt = sin2_ti / (e * e)
    if sin2_tt >= 1.0:
        return np.zeros(3)
    ct_t = math.sqrt(1.0 - sin2_tt)
    return -wo / e + (ct / e - ct_t) * na


# ----- sampling helpers (ref :670-721) -----

def rand_unit_vec(rng: Rng):
    rx, ry = rng.f2()
    theta = 2.0 * PI * rx
    phi = math.acos(1.0 - 2.0 * ry)
    return _v(math.sin(phi) * math.cos(theta),
              math.sin(phi) * math.sin(theta), math.cos(phi))


def build_tangent_frame(n):
    """ref :677-681."""
    if abs(n[1]) > 0.99999:
        return _v(1.0, 0.0, 0.0)
    return normalize(np.cross(_v(0.0, 1.0, 0.0), n))


def light_normal(light):
    """ref :683-686 (y forced downward)."""
    ny_sq = max(0.0, 1.0 - light.nx * light.nx - light.nz * light.nz)
    return _v(light.nx, -math.sqrt(ny_sq), light.nz)


def sample_square_point(light, u):
    n = light_normal(light)
    T = build_tangent_frame(n)
    B = np.cross(n, T)
    hw = light.hw
    su = (u[0] - 0.5) * 2.0 * hw
    sv = (u[1] - 0.5) * 2.0 * hw
    return np.asarray(light.pos) + su * T + sv * B


def sample_cosine_hemisphere_dir(normal, rng: Rng):
    ux, uy = rng.f2()
    theta = 2.0 * PI * ux
    r = math.sqrt(uy)
    x = r * math.cos(theta)
    y = r * math.sin(theta)
    z = math.sqrt(max(0.0, 1.0 - r * r))
    T = build_tangent_frame(normal)
    B = np.cross(normal, T)
    return x * T + y * B + z * normal


def sample_cone_toward(origin, targ, rng: Rng):
    """ref :710-721 — NOTE: draws 3 floats, uses uc and u.x only."""
    d = normalize(np.asarray(targ) - np.asarray(origin))
    T = build_tangent_frame(d)
    B = np.cross(d, T)
    uc = rng.f1()
    ux, _uy = rng.f2()
    cos_t = 1.0 - uc * (1.0 - PHOTON_CONE_COS)
    sin_t = math.sqrt(max(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * PI * ux
    return sin_t * math.cos(phi) * T + sin_t * math.sin(phi) * B + cos_t * d


# ----- scene records -----

@dataclasses.dataclass
class OMaterial:
    color: tuple          # rgb
    roughness: float
    ior: float
    mtype: int            # 0 diffuse, 1 dielectric


@dataclasses.dataclass
class OSphere:
    mat: int
    radius: float
    center: tuple


@dataclasses.dataclass
class OLight:
    pos: tuple
    hw: float             # position.w (half-width)
    color: tuple
    intensity: float
    temp: float
    ltype: int            # 0 point, 1 square area
    nx: float
    nz: float


@dataclasses.dataclass
class OTriangle:
    a: tuple              # vertex A
    e1: tuple             # edge B-A
    e2: tuple             # edge C-A
    mat: int              # mesh_indices[..].w (ref instance.rs:88-92)


@dataclasses.dataclass
class OScene:
    materials: list
    spheres: list
    lights: list
    triangles: list = dataclasses.field(default_factory=list)


def scene_from_tpurt(scene) -> OScene:
    """Lift a tpurt SoA scene (spheres + lights only) into oracle records."""
    mats = [OMaterial(tuple(np.asarray(scene.mat_color[i])),
                      float(scene.mat_rough[i]), float(scene.mat_ior[i]),
                      int(scene.mat_type[i]))
            for i in range(scene.mat_color.shape[0])]
    sphs = [OSphere(int(scene.sph_mat[i]), float(scene.sph_radius[i]),
                    tuple(np.asarray(scene.sph_center[i])))
            for i in range(scene.num_spheres)]
    lts = [OLight(tuple(np.asarray(scene.light_pos[i])),
                  float(scene.light_hw[i]),
                  tuple(np.asarray(scene.light_color[i])),
                  float(scene.light_intensity[i]),
                  float(scene.light_temp[i]), int(scene.light_type[i]),
                  float(scene.light_normal[i][0]),
                  float(scene.light_normal[i][2]))
           for i in range(scene.num_lights)]
    tris = [OTriangle(tuple(np.asarray(scene.tri_a[i], np.float64)),
                      tuple(np.asarray(scene.tri_e1[i], np.float64)),
                      tuple(np.asarray(scene.tri_e2[i], np.float64)),
                      int(scene.tri_mat[i]))
            for i in range(scene.num_triangles)]
    return OScene(mats, sphs, lts, tris)


# ----- intersection (ref :279-299, :342-354, :462-473, :500-563) -----

_BIG = -10000000.0


def closest_sphere_hit(sc: OScene, o, d):
    """Returns (t, loc, normal, mat_id) with t<0 on miss (ref :342-354:
    best tracked by t>0 and |t| < |best|, best init -1e7)."""
    best_t = _BIG
    best = None
    for sp in sc.spheres:
        center = np.asarray(sp.center)
        oc = o - center
        a = np.dot(d, d)
        half_b = np.dot(oc, d)
        c = np.dot(oc, oc) - sp.radius * sp.radius
        disc = half_b * half_b - a * c
        if disc > 0.0:
            t = (-half_b - math.sqrt(disc)) / a
            if t > 0.0 and abs(t) < abs(best_t):
                loc = o + d * t * 0.9999     # pull-back (ref :295)
                best_t = t
                best = (t, loc, normalize(loc - center), sp.mat)
    if best is None:
        return (_BIG, None, None, 0)
    return best


FLT_EPS32 = 1.1754943508222875e-38    # bitcast<f32>(0x1p-126f) (ref :309)


def triangle_hit(o, d, tri: OTriangle):
    """Moller-Trumbore exactly as the reference (ref :303-338): subnormal
    epsilon det test, t > eps, hit point offset 1e-5 along the geometric
    normal, normal NOT flipped toward the ray (single-sided shading)."""
    e1 = np.asarray(tri.e1)
    e2 = np.asarray(tri.e2)
    rce2 = np.cross(d, e2)
    det = np.dot(e1, rce2)
    if -FLT_EPS32 < det < FLT_EPS32:
        return None
    inv_det = 1.0 / det
    sv = o - np.asarray(tri.a)
    u = inv_det * np.dot(sv, rce2)
    if u < 0.0 or u > 1.0:
        return None
    sce1 = np.cross(sv, e1)
    v = inv_det * np.dot(d, sce1)
    if v < 0.0 or u + v > 1.0:
        return None
    t = inv_det * np.dot(e2, sce1)
    if t > FLT_EPS32:
        n = normalize(np.cross(e1, e2))
        loc = o + n * 1e-5 + d * t           # ref :332
        return (t, loc, n, tri.mat)
    return None


def closest_triangle_hit(sc: OScene, o, d):
    """Linear sweep with the BVH walk's winner rule (ref :395-428:
    t > 0 and |t| < |best|, best init -1e7 — the tree visits a superset
    in a different order; nearest-positive winner is identical)."""
    best_t = _BIG
    best = None
    for tri in sc.triangles:
        h = triangle_hit(o, d, tri)
        if h is not None and h[0] > 0.0 and abs(h[0]) < abs(best_t):
            best_t = h[0]
            best = h
    if best is None:
        return (_BIG, None, None, 0)
    return best


def closest_hit(sc: OScene, o, d):
    """Sphere + mesh merge exactly as both reference paths do it
    (camera :874-878, photon :768-770): the triangle hit wins iff
    t > 0 and |t| < |sphere t|."""
    hit = closest_sphere_hit(sc, o, d)
    if sc.triangles:
        th = closest_triangle_hit(sc, o, d)
        if th[0] > 0.0 and abs(th[0]) < abs(hit[0]):
            hit = th
    return hit


def hit_triangle_shadow(o, d, tri: OTriangle, t_max):
    """ref :475-498: same Moller-Trumbore, t in (flt_eps, t_max)."""
    e1 = np.asarray(tri.e1)
    e2 = np.asarray(tri.e2)
    rce2 = np.cross(d, e2)
    det = np.dot(e1, rce2)
    if abs(det) < FLT_EPS32:
        return False
    inv_det = 1.0 / det
    sv = o - np.asarray(tri.a)
    u = inv_det * np.dot(sv, rce2)
    if u < 0.0 or u > 1.0:
        return False
    sce1 = np.cross(sv, e1)
    v = inv_det * np.dot(d, sce1)
    if v < 0.0 or u + v > 1.0:
        return False
    t = inv_det * np.dot(e2, sce1)
    return t > FLT_EPS32 and t < t_max


def shadow_attenuation(sc: OScene, o, d, t_max, lam):
    """ref :511-563: Fresnel-transmitting spheres, then triangles occlude
    FULLY (:540-562 returns 0 on any hit within range)."""
    atten = 1.0
    for sp in sc.spheres:
        center = np.asarray(sp.center)
        oc = o - center
        a = np.dot(d, d)
        half_b = np.dot(oc, d)
        c = np.dot(oc, oc) - sp.radius * sp.radius
        disc = half_b * half_b - a * c
        if disc <= 0.0:
            t0, t1 = -1.0, -1.0
        else:
            sq = math.sqrt(disc)
            t0 = (-half_b - sq) / a
            t1 = (-half_b + sq) / a
        if t1 <= 0.0 or t0 >= t_max:
            continue
        mat = sc.materials[sp.mat]
        if mat.mtype == 0:
            return 0.0
        t_entry = max(t0, 0.0)
        t_exit = min(t1, t_max)
        if t_entry >= t_exit:
            continue
        eta = cauchy_ior(mat.ior, lam)
        p1 = o + d * t_entry
        n1 = normalize(p1 - center)
        R1 = fr_dielectric(-np.dot(n1, d), eta)
        p2 = o + d * t_exit
        n2 = normalize(p2 - center)
        R2 = fr_dielectric(-np.dot(n2, d), eta)
        atten *= (1.0 - R1) * (1.0 - R2)
    for tri in sc.triangles:
        if hit_triangle_shadow(o, d, tri, t_max):
            return 0.0
    return atten


def sample_direct_lighting(sc: OScene, pos, norm, lam, rng: Rng):
    """ref :568-615."""
    result = np.zeros(3)
    for light in sc.lights:
        spd = blackbody(lam, light.temp) if light.temp > 0.0 else 1.0
        light_rgb = (np.asarray(light.color) * light.intensity * spd
                     * cie_to_rgb(lam) * VISIBLE_RANGE)
        if light.ltype == 0:
            to_light = np.asarray(light.pos) - pos
            dist = np.linalg.norm(to_light)
            if dist < EPS:
                continue
            ldir = to_light / dist
            ndotl = np.dot(norm, ldir)
            if ndotl <= 0.0:
                continue
            atten = shadow_attenuation(sc, pos + norm * EPS, ldir,
                                       dist - EPS, lam)
            if atten <= 0.0:
                continue
            result += light_rgb * ndotl * atten / (dist * dist)
        else:
            hw = light.hw
            if hw <= 0.0:
                continue
            u = rng.f2()           # drawn BEFORE visibility checks (:596)
            lp = sample_square_point(light, u)
            to_light = lp - pos
            dist = np.linalg.norm(to_light)
            if dist < EPS:
                continue
            ldir = to_light / dist
            ndotl = np.dot(norm, ldir)
            if ndotl <= 0.0:
                continue
            lnorm = light_normal(light)
            cos_light = max(0.0, np.dot(lnorm, -ldir))
            if cos_light <= 0.0:
                continue
            atten = shadow_attenuation(sc, pos + norm * EPS, ldir,
                                       dist - EPS, lam)
            if atten <= 0.0:
                continue
            pdf = 1.0 / max(4.0 * hw * hw, 1e-10)
            result += light_rgb * ndotl * cos_light * atten / (dist * dist * pdf)
    return result


# ----- photon pass (ref :725-861) -----

def evaluate_bsdf(wo, wi, n, mat: OMaterial, lam):
    """ref :725-743 (vis_wo arrives raw/unnormalized — quirk kept)."""
    if mat.mtype == 0:
        return oren_nayar_f(wo, wi, n, np.asarray(mat.color), mat.roughness)
    ndotv = np.dot(n, wo)
    ndotl = np.dot(n, wi)
    if ndotv * ndotl > 0.0:
        alpha = math.sqrt(mat.roughness)
        eta = cauchy_ior(mat.ior, lam)
        wm = normalize(wi + wo)
        R = fr_dielectric(np.dot(wo, wm), eta)
        D = tr_d(wm, alpha)
        G = tr_g(wo, wi, alpha)
        val = D * G * R / max(4.0 * abs(wi[2]) * abs(wo[2]), 1e-10)
        return np.full(3, val)
    return np.zeros(3)


def trace_photon(sc: OScene, rng: Rng, vis_pos, vis_norm, vis_wo,
                 vis_mat: OMaterial, vis_tp, rad, lam, light: OLight):
    """ref :745-861 — stream CONTINUES the pixel's camera-path RNG."""
    contrib = np.zeros(3)
    light_power = np.asarray(light.color) * light.intensity

    if light.ltype == 0:
        cone_factor = (1.0 - PHOTON_CONE_COS) * 0.5
        tp = light_power / K_PHOTONS * cone_factor
        o = np.asarray(light.pos, np.float64)
        d = sample_cone_toward(o, _v(0.0, 0.0, 0.0), rng)
    else:
        u_emit = rng.f2()
        lp = sample_square_point(light, u_emit)
        lnorm = light_normal(light)
        d = sample_cosine_hemisphere_dir(lnorm, rng)
        tp = light_power / K_PHOTONS
        o = lp + lnorm * EPS

    for _bounce in range(MAX_PHOTON_BOUNCES):
        t, loc, normal, mat_id = closest_hit(sc, o, d)   # ref :768-770
        if t < 0.0:
            break
        dist = np.linalg.norm(loc - vis_pos)
        if dist < rad:
            wi_photon = -d
            f = evaluate_bsdf(vis_wo, wi_photon, vis_norm, vis_mat, lam)
            kern = 1.0 - dist / rad
            contrib += vis_tp * f * tp * kern / max(PI * rad * rad, 1e-10)

        mat = sc.materials[mat_id]
        wo = -d
        if mat.mtype == 0:
            rn = rand_unit_vec(rng)
            wi = normalize(normal + rn)
            pdf = max(np.dot(normal, wi), 1e-10) / PI
            f_diff = oren_nayar_f(normalize(wo), wi, normal,
                                  np.asarray(mat.color), mat.roughness)
            cos_term = max(np.dot(normal, wi), 1e-10)
            tp = tp * f_diff * cos_term / max(pdf, 1e-10)
            o, d = loc + normal * EPS, wi
        else:
            eta = cauchy_ior(mat.ior, lam)      # Cauchy HERE (:797)
            alpha = math.sqrt(mat.roughness)
            if alpha < 1e-3:
                cos_t = np.dot(wo, normal)
                R = fr_dielectric(abs(cos_t), eta)
                if rng.f1() < R:
                    wi = reflect_dir(wo, normal)
                    o, d = loc + normal * EPS, wi
                else:
                    wi = refract_dir(wo, normal, eta)
                    if np.linalg.norm(wi) < 0.5:
                        break
                    etap = 1.0 / eta if cos_t < 0.0 else eta
                    tp = tp / (etap * etap)
                    o, d = loc - normal * EPS, wi
            else:
                T = build_tangent_frame(normal)
                B = np.cross(normal, T)
                wo_l = _v(np.dot(wo, T), np.dot(wo, B), np.dot(wo, normal))
                u = rng.f2()
                wm = tr_sample_wm(wo_l, u, alpha)
                dot_wowm = abs(np.dot(wo_l, wm))
                R = fr_dielectric(dot_wowm, eta)
                Tns = 1.0 - R
                if rng.f1() < R / max(R + Tns, 1e-10):
                    wi_l = reflect_dir(wo_l, wm)
                    if wo_l[2] * wi_l[2] <= 0.0:
                        break
                    D = tr_d(wm, alpha)
                    G = tr_g(wo_l, wi_l, alpha)
                    bsdf = D * G * R / max(4.0 * abs(wi_l[2]) * abs(wo_l[2]),
                                           1e-10)
                    pdf = tr_lambda(wo_l, alpha) + 1.0   # quirk (:831)
                    tp = tp * bsdf * abs(wi_l[2]) / max(pdf, 1e-10)
                    wi = wi_l[0] * T + wi_l[1] * B + wi_l[2] * normal
                    o, d = loc + normal * EPS, wi
                else:
                    wi_l = refract_dir(wo_l, wm, eta)
                    if (np.linalg.norm(wi_l) < 0.5
                            or wo_l[2] * wi_l[2] > 0.0):
                        break
                    D = tr_d(wm, alpha)
                    G = tr_g(wo_l, wi_l, alpha)
                    ct_i = abs(wi_l[2])
                    ct_o = abs(wo_l[2])
                    denom = np.dot(wi_l, wm) + np.dot(wo_l, wm) / eta
                    bsdf = Tns * D * G * abs(
                        np.dot(wi_l, wm) * np.dot(wo_l, wm)
                        / max(ct_i * ct_o * denom * denom, 1e-10))
                    pdf = tr_lambda(wo_l, alpha) + 1.0   # quirk (:845)
                    tp = tp * bsdf * ct_i / max(pdf, 1e-10)
                    etap = 1.0 / eta if wo_l[2] < 0.0 else eta
                    tp = tp / (etap * etap)
                    wi = wi_l[0] * T + wi_l[1] * B + wi_l[2] * normal
                    o, d = loc - normal * EPS, wi

        prob = max(tp[0], tp[1], tp[2])
        if prob < 0.01:
            break
        if rng.f1() > prob:
            break
        tp = tp / prob
    return contrib


# ----- camera path (ref :865-982) -----

def recursive_trace(sc: OScene, o, d, rng: Rng, lam, depth, vis):
    """Returns radiance; writes the first-diffuse-bounce vispoint into the
    `vis` dict exactly like the persistent buffer (ref :893-900)."""
    tp = np.ones(3)
    rad = np.zeros(3)
    vp_stored = False
    for _bounce in range(depth):
        t, loc, normal, mat_id = closest_hit(sc, o, d)
        if t < 0.0:
            # sky is black (ref :617-620) — contributes nothing
            break
        mat = sc.materials[mat_id]
        wo = -d
        if mat.mtype == 0:
            color = np.asarray(mat.color)
            if not vp_stored:
                vis["pos"] = loc.copy()
                vis["norm"] = normal.copy()
                vis["wo"] = wo.copy()        # raw, unnormalized (:897)
                vis["tp"] = tp.copy()
                vis["mat"] = mat_id
                vp_stored = True
            direct = sample_direct_lighting(sc, loc, normal, lam, rng)
            rad = rad + tp * color * direct
            rn = rand_unit_vec(rng)
            wi = normalize(normal + rn)
            pdf = max(np.dot(normal, wi), 1e-10) / PI
            f_diff = oren_nayar_f(normalize(wo), wi, normal, color,
                                  mat.roughness)
            cos_term = max(np.dot(normal, wi), 1e-10)
            tp = tp * f_diff * cos_term / max(pdf, 1e-10)
            o, d = loc + normal * EPS, wi
        else:
            eta = mat.ior               # BASE ior — no Cauchy (:915)
            alpha = math.sqrt(mat.roughness)
            if alpha < 1e-3:
                cos_t = np.dot(wo, normal)   # wo unnormalized (:919)
                R = fr_dielectric(abs(cos_t), eta)
                if rng.f1() < R:
                    wi = reflect_dir(wo, normal)
                    o, d = loc + normal * EPS, wi
                else:
                    wi = refract_dir(wo, normal, eta)
                    if np.linalg.norm(wi) < 0.5:
                        break
                    etap = 1.0 / eta if cos_t < 0.0 else eta
                    tp = tp / (etap * etap)
                    o, d = loc - normal * EPS, wi
            else:
                T = build_tangent_frame(normal)
                B = np.cross(normal, T)
                wo_l = _v(np.dot(wo, T), np.dot(wo, B), np.dot(wo, normal))
                u = rng.f2()
                wm = tr_sample_wm(wo_l, u, alpha)
                dot_wowm = abs(np.dot(wo_l, wm))
                R = fr_dielectric(dot_wowm, eta)
                Tns = 1.0 - R
                if rng.f1() < R / max(R + Tns, 1e-10):
                    wi_l = reflect_dir(wo_l, wm)
                    if wo_l[2] * wi_l[2] <= 0.0:
                        break
                    D = tr_d(wm, alpha)
                    G = tr_g(wo_l, wi_l, alpha)
                    ct_i = abs(wi_l[2])
                    ct_o = abs(wo_l[2])
                    bsdf = D * G * R / max(4.0 * ct_i * ct_o, 1e-10)
                    G1 = 1.0 / (1.0 + tr_lambda(wo_l, alpha))
                    pdf_wm = (G1 / max(ct_o, 1e-10)) * D * dot_wowm
                    pdf = max(pdf_wm / max(4.0 * dot_wowm, 1e-10), 1e-10) \
                        * (R / max(R + Tns, 1e-10))
                    tp = tp * bsdf * ct_i / max(pdf, 1e-10)
                    wi = wi_l[0] * T + wi_l[1] * B + wi_l[2] * normal
                    o, d = loc + normal * EPS, wi
                else:
                    wi_l = refract_dir(wo_l, wm, eta)
                    if (np.linalg.norm(wi_l) < 0.5
                            or wo_l[2] * wi_l[2] > 0.0):
                        break
                    D = tr_d(wm, alpha)
                    G = tr_g(wo_l, wi_l, alpha)
                    ct_i = abs(wi_l[2])
                    ct_o = abs(wo_l[2])
                    denom = np.dot(wi_l, wm) + np.dot(wo_l, wm) / eta
                    bsdf = Tns * D * G * abs(
                        np.dot(wi_l, wm) * np.dot(wo_l, wm)
                        / max(ct_i * ct_o * denom * denom, 1e-10))
                    dwm_dwi = abs(np.dot(wi_l, wm)) / max(denom * denom,
                                                          1e-10)
                    G1 = 1.0 / (1.0 + tr_lambda(wo_l, alpha))
                    pdf = max((G1 / max(ct_o, 1e-10)) * D * dot_wowm
                              * dwm_dwi * (Tns / max(R + Tns, 1e-10)), 1e-10)
                    tp = tp * bsdf * ct_i / pdf
                    etap = 1.0 / eta if wo_l[2] < 0.0 else eta
                    tp = tp / (etap * etap)
                    wi = wi_l[0] * T + wi_l[1] * B + wi_l[2] * normal
                    o, d = loc - normal * EPS, wi

        prob = max(tp[0], tp[1], tp[2])
        if prob < 0.001:
            break
        if rng.f1() > prob:
            break
        tp = tp / prob
    return rad


# ----- the frame loop (ref cs_main :984-1022 + mega_kernel.rs:191-198) -----

def render_oracle(sc: OScene, cam, width, height, depth, seeds,
                  photon_radius_init=2.0, sppm_alpha=0.67, track_var=False):
    """Progressive render: `seeds` is the per-frame u32 seed sequence (the
    reference redraws rand::random() per frame, mega_kernel.rs:191; pass
    tpurt's _frame_seed sequence for stream-matched comparisons).

    Returns (mean_rgb (H,W,3), var_of_mean (H,W,3) or None): accumulation
    semantics exactly mirror the texture (sum in rgb, count in alpha)."""
    cam_o = np.asarray(cam.origin, np.float64)
    cam_h = np.asarray(cam.horizontal, np.float64)
    cam_v = np.asarray(cam.vertical, np.float64)
    cam_ll = np.asarray(cam.lower_left, np.float64)

    acc = np.zeros((height, width, 3))
    acc2 = np.zeros((height, width, 3)) if track_var else None
    vis = [[{"pos": np.zeros(3), "norm": np.zeros(3), "wo": np.zeros(3),
             "tp": np.zeros(3), "mat": 0}
            for _ in range(width)] for _ in range(height)]

    radius = photon_radius_init
    n_lights = len(sc.lights)
    for frame, seed in enumerate(seeds):
        for y in range(height):
            for x in range(width):
                rng = Rng((int(seed) + 1203793 * x + 7 * y) & M32)
                r1, r2 = rng.f2()
                u = x / width + r1 / width
                v = y / height + r2 / height
                d = cam_ll + cam_h * u + cam_v * v - cam_o
                lam = VISIBLE_MIN + rng.f1() * VISIBLE_RANGE
                vz = vis[y][x]
                rad = recursive_trace(sc, cam_o.copy(), d, rng, lam,
                                      depth, vz)
                photon = np.zeros(3)
                if n_lights > 0 and np.linalg.norm(vz["pos"]) > 0.001:
                    vmat = sc.materials[vz["mat"]]
                    for k in range(K_PHOTONS):
                        light = sc.lights[k % n_lights]
                        photon += trace_photon(
                            sc, rng, vz["pos"], vz["norm"], vz["wo"],
                            vmat, vz["tp"], radius, lam, light)
                total = rad + photon
                acc[y, x] += total
                if track_var:
                    acc2[y, x] += total * total
        k = frame + 1.0
        radius *= math.sqrt((k + sppm_alpha) / (k + 1.0))

    n = len(seeds)
    mean = acc / n
    if track_var:
        var_mean = (acc2 / n - mean * mean) / max(n - 1, 1)
        return mean, np.maximum(var_mean, 0.0)
    return mean, None
