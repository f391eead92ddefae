// baseline_sppm: an independent C++ implementation of the reference
// algorithm (wondergo2017/raytrace3: SPPM with planes/spheres/cubic-Bezier
// Newton intersection), used to
//   1. measure the C++ photons/s baseline that anchors bench.py's
//      vs_baseline ratio (BASELINE.md: "the C++ baseline must be measured
//      by us ... on the 512x512 teapot configuration"), and
//   2. render a LINEAR-radiance image of the full scene for statistical
//      cross-validation of the JAX renderer's specular + caustic transport
//      (VERDICT round 1, missing item 1): pass a 5th arg to dump the canvas.
//
// Deliberately written from the algorithm description, not transcribed:
// - same workload: eye pass (depth 13, all lobes followed), photon rounds of
//   100 photons, Newton 10 iters x 50 random restarts per candidate patch
//   ray, AABB-gated, radius^2 = 2.0 neighbor deposits;
// - same transport rules as the reference (Raytracer.h:117-209,296-357):
//   eye weight multiplies color * lobe coefficient per branch; photon flux
//   multiplies the surface COLOR ONLY on every roulette branch
//   (Raytracer.h:165,180,190); deposits use the arrival flux (:156);
//   roulette keeps the full flux (the reference's biased pick, Obj.h:30-45);
//   the HitPoint::update radius shrink is dead code as executed
//   (Raytracer.h:74 guard: N never leaves 0), so radii stay at INIT_R2 and
//   the image estimate is tao / (pi r^2 totalPhotons) (Raytracer.h:292);
// - neighbor search: uniform grid (cell = sqrt(2)) instead of FLANN's
//   kd-tree - at this radius/scene it is faster than a kd-tree, which makes
//   the measured baseline CONSERVATIVE (our speedup ratio is understated);
// - 3x3 solve by adjugate (no OpenCV dependency) - also faster than the
//   reference's cv::Matx inverse, again conservative.
//
// Build: g++ -O3 -march=native -fopenmp -std=c++17 baseline_sppm.cpp -o baseline_sppm
// Run:   ./baseline_sppm <teapot.bpt> [res] [rounds] [threads] [dump.bin]
// Emits one JSON line: {"photons_per_s": ..., "eye_s": ..., "photon_s": ...}
// With dump.bin: also writes res*res*3 float32 linear radiance (pixel id =
// y*res+x, matching raytrace3_tpu.render.camera.emit_rays order) and a
// tone-mapped dump.bin.ppm for eyeballing.

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <vector>
#include <array>
#include <fstream>
#include <algorithm>
#ifdef _OPENMP
#include <omp.h>
#endif

struct V3 {
  double x = 0, y = 0, z = 0;
  V3() = default;
  V3(double a, double b, double c) : x(a), y(b), z(c) {}
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  V3 mul(const V3& o) const { return {x * o.x, y * o.y, z * o.z}; }
  double dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  V3 cross(const V3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double n2() const { return dot(*this); }
  V3 unit() const { double m = std::sqrt(n2()); return m > 0 ? *this * (1.0 / m) : *this; }
};

static const double EPS = 1e-4;
static const double INIT_R2 = 2.0;
static const int MAX_DEP = 13;

// xorshift RNG, one per thread
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed * 2685821657736338717ULL + 1) {}
  double uni() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return double(s >> 11) * (1.0 / 9007199254740992.0);
  }
  V3 sphere() {
    double z = 2 * uni() - 1, phi = 6.283185307179586 * uni();
    double r = std::sqrt(std::max(0.0, 1 - z * z));
    return {r * std::cos(phi), r * std::sin(phi), z};
  }
  V3 cosine(const V3& n) {
    double u1 = uni(), u2 = uni();
    double ct = std::sqrt(u1), st = std::sqrt(1 - u1), phi = 6.283185307179586 * u2;
    V3 a = std::fabs(n.x) > 0.1 ? V3(0, 1, 0) : V3(1, 0, 0);
    V3 t = a.cross(n).unit(), b = n.cross(t);
    return (t * (st * std::cos(phi)) + b * (st * std::sin(phi)) + n * ct).unit();
  }
};

struct Mat {  // material; predicates follow Element.h:16-18 + Vec3.h:72-79
  V3 diff, refl, refr; double refrn;
  bool isDiff() const { return diff.x > EPS && diff.y > EPS && diff.z > EPS; }
  bool isRefl() const { return refl.x > EPS && refl.y > EPS && refl.z > EPS; }
  bool isRefr() const { return refr.x > EPS && refr.y > EPS && refr.z > EPS; }
};

// Texture with the reference's exact bilinear + wrap rule
// (Element.h:61-72): row = fract(u)*rows, col = fract(v)*cols,
// r1 = floor(row + 1e-10), out-of-range r1 wraps to rows-1/0, r2 to 0.
struct Tex {
  int H = 0, W = 0;
  std::vector<float> d;  // H*W*3 row-major
  V3 colorUV(double u, double v) const {
    double row = (u - std::floor(u)) * H;
    double col = (v - std::floor(v)) * W;
    int r1 = int(std::floor(row + 1e-10));
    int c1 = int(std::floor(col + 1e-10));
    int r2 = r1 + 1, c2 = c1 + 1;
    double detR = r2 - row, detC = c2 - col;
    r1 = r1 >= 0 ? (r1 >= H ? 0 : r1) : H - 1;
    c1 = c1 >= 0 ? (c1 >= W ? 0 : c1) : W - 1;
    r2 = r2 < H ? r2 : 0;
    c2 = c2 < W ? c2 : 0;
    auto g = [&](int r, int c) {
      size_t i = 3 * (size_t(r) * W + c);
      return V3(d[i], d[i + 1], d[i + 2]);
    };
    return g(r1, c1) * (detR * detC) + g(r1, c2) * (detR * (1 - detC)) +
           g(r2, c1) * ((1 - detR) * detC) +
           g(r2, c2) * ((1 - detR) * (1 - detC));
  }
};

struct Hit {
  double t = 1e20; V3 p, n; bool inside = false; int obj = -1;
  double u = 0, v = 0;  // texture coordinates (quirk rules, see below)
};

struct Plane { V3 p0, n; };
struct Sphere { V3 c; double r; };

struct Patch {
  V3 P[16];
  V3 lo, hi;
  void bound() {
    lo = {1e20, 1e20, 1e20}; hi = {-1e20, -1e20, -1e20};
    for (auto& p : P) {
      lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
      hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
    }
  }
};

static bool slab(const V3& o, const V3& d, const V3& lo, const V3& hi) {
  double t0 = -1e30, t1 = 1e30;
  const double* op = &o.x; const double* dp = &d.x;
  const double* lp = &lo.x; const double* hp = &hi.x;
  for (int i = 0; i < 3; i++) {
    if (std::fabs(dp[i]) < 1e-12) { if (op[i] < lp[i] || op[i] > hp[i]) return false; continue; }
    double a = (lp[i] - op[i]) / dp[i], b = (hp[i] - op[i]) / dp[i];
    if (a > b) std::swap(a, b);
    t0 = std::max(t0, a); t1 = std::min(t1, b);
  }
  return t1 >= std::max(t0, 0.0);
}

static V3 bez(const V3 P[4], double t) {
  double s = 1 - t;
  return P[0] * (s * s * s) + P[1] * (3 * t * s * s) + P[2] * (3 * t * t * s) + P[3] * (t * t * t);
}
static V3 dbez(const V3 P[4], double t) {
  double s = 1 - t;
  return P[0] * (-3 * s * s) + P[1] * (3 * s * s - 6 * t * s) + P[2] * (6 * t * s - 3 * t * t) + P[3] * (3 * t * t);
}
static V3 patchPoint(const V3 P[16], double u, double v) {
  V3 c[4];
  for (int i = 0; i < 4; i++) c[i] = bez(P + 4 * i, u);
  return bez(c, v);
}
static void patchDerivs(const V3 P[16], double u, double v, V3& S, V3& Su, V3& Sv) {
  V3 c[4], dc[4];
  for (int i = 0; i < 4; i++) { c[i] = bez(P + 4 * i, u); dc[i] = dbez(P + 4 * i, u); }
  S = bez(c, v); Sv = dbez(c, v); Su = bez(dc, v);
}

// Solve A x = r where A columns are c0,c1,c2 (adjugate/Cramer).
static bool solve3(const V3& c0, const V3& c1, const V3& c2, const V3& r, V3& x) {
  V3 c12 = c1.cross(c2);
  double det = c0.dot(c12);
  if (std::fabs(det) < 1e-14) return false;
  double id = 1.0 / det;
  x.x = r.dot(c12) * id;
  x.y = c0.dot(r.cross(c2)) * id;
  x.z = c0.dot(c1.cross(r)) * id;
  return true;
}

struct Scene {
  std::vector<Plane> planes;
  std::vector<Sphere> spheres;
  std::vector<Patch> patches;
  V3 bezLo, bezHi;
  std::vector<Mat> mats;  // per object id: planes, spheres, bezier(1)
  std::vector<V3> cols;   // per object flat color (Obj.h:46, GetColor w/o texture)
  std::vector<Tex> texs;     // textures (optional; crossval textured mode)
  std::vector<int> objTex;   // per object texture id, -1 = flat color
  V3 lightPos{50, 60, 85};
  V3 lightCol{5000, 5000, 5000};

  int nObj() const { return int(planes.size() + spheres.size()) + 1; }

  // GetColor: texture sample at the hit's (u, v) when assigned, else the
  // flat color (Obj.h:86-88).
  V3 color(const Hit& h) const {
    int t = (h.obj >= 0 && h.obj < int(objTex.size())) ? objTex[h.obj] : -1;
    return t >= 0 ? texs[size_t(t)].colorUV(h.u, h.v) : cols[h.obj];
  }

  // Newton: 50 random restarts x 10 iterations (the reference budget,
  // Bezier.h:6,115), per AABB-passing patch.
  bool bezierHit(const V3& o, const V3& d, Rng& rng, double& tBest, V3& nOut,
                 double& uOut) const {
    if (!slab(o, d, bezLo, bezHi)) return false;
    tBest = 1e20;
    int bestPatch = -1; double bu = 0, bv = 0;
    for (size_t pi = 0; pi < patches.size(); pi++) {
      const Patch& pa = patches[pi];
      if (!slab(o, d, pa.lo, pa.hi)) continue;
      for (int rs = 0; rs < 50; rs++) {
        double t = 0, u = rng.uni(), v = rng.uni();
        for (int it = 0; it < 10; it++) {
          V3 S, Su, Sv;
          patchDerivs(pa.P, u, v, S, Su, Sv);
          V3 L = o + d * t;
          V3 x;
          if (!solve3(d, Su * -1.0, Sv * -1.0, (L - S) * -1.0, x)) break;
          t += x.x; u += x.y; v += x.z;
          V3 S2 = patchPoint(pa.P, u, v);
          V3 res = (o + d * t) - S2;
          if (res.n2() < EPS && u >= 0 && u <= 1 && v >= 0 && v <= 1 && t > EPS) {
            if (t < tBest) { tBest = t; bestPatch = int(pi); bu = u; bv = v; }
          }
        }
      }
    }
    if (bestPatch < 0) return false;
    V3 S, Su, Sv;
    patchDerivs(patches[bestPatch].P, bu, bv, S, Su, Sv);
    V3 n = Su.cross(Sv);
    if (n.dot(d) > 0) n = n * -1.0;
    nOut = n.unit();
    uOut = bu;
    return true;
  }

  Hit nearest(const V3& o, const V3& d, Rng& rng) const {
    Hit h;
    for (size_t i = 0; i < planes.size(); i++) {
      double pr = d.dot(planes[i].n);
      if (std::fabs(pr) < EPS) continue;
      double t = (planes[i].p0 - o).dot(planes[i].n) / pr;
      if (t > EPS && t < h.t) { h.t = t; h.obj = int(i); h.n = planes[i].n; h.inside = false; }
    }
    for (size_t i = 0; i < spheres.size(); i++) {
      V3 L = spheres[i].c - o;
      double pr = L.dot(d);
      double det2 = spheres[i].r * spheres[i].r - (L.n2() - pr * pr);
      if (det2 < EPS) continue;
      double dt = std::sqrt(det2);
      double t1 = pr - dt, t2 = pr + dt;
      if (t2 < EPS) continue;
      bool ins = t1 < EPS;
      double t = ins ? t2 : t1;
      if (t < h.t) {
        h.t = t; h.obj = int(planes.size() + i);
        h.n = ((o + d * t) - spheres[i].c).unit();
        h.inside = ins;
      }
    }
    double tb; V3 nb; double ub = 0;
    if (bezierHit(o, d, rng, tb, nb, ub)) {
      if (tb < h.t) {
        h.t = tb; h.obj = nObj() - 1; h.n = nb; h.inside = false;
        // Bezier UV quirk (Bezier.h:278): texture lookup at (u, t) —
        // the RAY DISTANCE stands in for v.
        h.u = ub; h.v = tb;
      }
    }
    if (h.obj >= 0) h.p = o + d * h.t;

    // Texture coordinates for plane/sphere winners (bezier set its own).
    if (h.obj >= 0 && h.obj < int(planes.size())) {
      // Planar UV (Obj.h:86-100) incl. the swapped-scale quirk (:97-98):
      // u is divided by |texV| = 300, v by |texU| = 400; axis pick = LAST
      // axis with a nonzero normal component, udex/vdex = the next two.
      const V3& n = planes[size_t(h.obj)].n;
      int ndir = n.z != 0 ? 2 : (n.y != 0 ? 1 : 0);
      int udex = (ndir + 1) % 3, vdex = (ndir + 2) % 3;
      V3 dd = h.p - planes[size_t(h.obj)].p0;
      const double* dp = &dd.x;
      h.v = 0.5 + dp[vdex] / 400.0;
      h.u = 0.5 + dp[udex] / 300.0;
    } else if (h.obj >= int(planes.size()) && h.obj < nObj() - 1) {
      // Spherical polar UV (Obj.h:140-153): poles texU=(0,3,-3)/|.|,
      // texV=(1,0,0); u = theta/pi, v = phi/2pi mirrored by handedness.
      V3 texU = V3{0, 3, -3}.unit(), texV{1, 0, 0};
      V3 n = h.n;  // outward unit normal = (p - c)/r
      double lim = 1.0 - 1e-6;
      double ct = std::clamp(n.dot(texV), -lim, lim);
      double theta = std::acos(ct);
      double st = std::sin(theta);
      double tt = n.dot(texU) / std::max(st, 1e-12);
      double phi = std::acos(std::clamp(tt, -lim, lim));
      h.u = theta / 3.14159265358979;
      h.v = phi / (2 * 3.14159265358979);
      if (n.dot(texU.cross(texV)) < 0) h.v = 1.0 - h.v;
    }
    return h;
  }
};

struct HitPoint {
  V3 p, n, wgt;
  double r2 = INIT_R2;
  double tao[3] = {0, 0, 0};
  double nphot = 0;  // accumulated N (live-sppm mode only)
  int newN = 0;
  int px = -1;  // pixel id (y*res + x), Raytracer.h:47-68 carries (x, y)
};

// uniform grid over hit points (cell = sqrt(INIT_R2))
struct Grid {
  double cell = std::sqrt(INIT_R2);
  V3 lo{-20, -20, -20};
  int nx = 0, ny = 0, nz = 0;
  std::vector<int> start;
  std::vector<int> items;
  void build(const std::vector<HitPoint>& hps) {
    V3 hi{120, 120, 180};
    nx = int((hi.x - lo.x) / cell) + 1;
    ny = int((hi.y - lo.y) / cell) + 1;
    nz = int((hi.z - lo.z) / cell) + 1;
    std::vector<int> cnt(size_t(nx) * ny * nz + 1, 0);
    auto cid = [&](const V3& p) {
      int ix = std::clamp(int((p.x - lo.x) / cell), 0, nx - 1);
      int iy = std::clamp(int((p.y - lo.y) / cell), 0, ny - 1);
      int iz = std::clamp(int((p.z - lo.z) / cell), 0, nz - 1);
      return (ix * ny + iy) * nz + iz;
    };
    for (auto& h : hps) cnt[cid(h.p) + 1]++;
    for (size_t i = 1; i < cnt.size(); i++) cnt[i] += cnt[i - 1];
    start = cnt;
    items.resize(hps.size());
    std::vector<int> cur(start.begin(), start.end() - 1);
    for (size_t i = 0; i < hps.size(); i++) items[size_t(cur[cid(hps[i].p)]++)] = int(i);
  }
  template <class F>
  void query(const V3& p, F&& f) const {
    int ix = std::clamp(int((p.x - lo.x) / cell), 0, nx - 1);
    int iy = std::clamp(int((p.y - lo.y) / cell), 0, ny - 1);
    int iz = std::clamp(int((p.z - lo.z) / cell), 0, nz - 1);
    for (int dx = -1; dx <= 1; dx++)
      for (int dy = -1; dy <= 1; dy++)
        for (int dz = -1; dz <= 1; dz++) {
          int jx = ix + dx, jy = iy + dy, jz = iz + dz;
          if (jx < 0 || jy < 0 || jz < 0 || jx >= nx || jy >= ny || jz >= nz) continue;
          int c = (jx * ny + jy) * nz + jz;
          for (int k = start[c]; k < start[c + 1]; k++) f(items[k]);
        }
  }
};

struct Tracer {
  const Scene* sc;
  std::vector<HitPoint> hps;
  Grid grid;
  Rng rng{12345};

  // ViewTrace (Raytracer.h:296-357): every active lobe is followed; the
  // per-branch weight is color * wgt * lobe-coefficient (:316,:324,:335).
  void eyeTrace(const V3& o, const V3& d, V3 wgt, int dep, int px) {
    if (dep > MAX_DEP) return;
    Hit h = sc->nearest(o, d, rng);
    if (h.obj < 0) return;
    const Mat& m = sc->mats[h.obj];
    const V3 col = sc->color(h);   // texture sample or flat (Obj.h:86-88)
    if (m.isDiff()) {
      HitPoint hp; hp.p = h.p; hp.n = h.n; hp.wgt = col.mul(wgt).mul(m.diff);
      hp.px = px;
      hps.push_back(hp);
    }
    if (m.isRefl())
      eyeTrace(h.p, (d - h.n * (2 * d.dot(h.n))).unit(), col.mul(wgt).mul(m.refl),
               dep + 1, px);
    if (m.isRefr()) {
      double eta = h.inside ? m.refrn : 1.0 / m.refrn;
      V3 n = h.inside ? h.n * -1.0 : h.n;
      double ci = -n.dot(d);
      double cr2 = 1 - (1 - ci * ci) * eta * eta;
      V3 nd = cr2 > EPS ? (d * eta + n * (eta * ci - std::sqrt(cr2))).unit()
                        : (d - n * (2 * d.dot(n))).unit();
      eyeTrace(h.p, nd, col.mul(wgt).mul(m.refr), dep + 1, px);
    }
  }

  // PhotonTrace (Raytracer.h:117-209): deposit the ARRIVAL flux at diffuse
  // surfaces (:156), then roulette ONE branch; every branch multiplies the
  // flux by the surface color ONLY (:165,:180,:190).
  void photonTrace(const V3& o, const V3& d, V3 flux, int dep) {
    if (dep > MAX_DEP) return;
    Hit h = sc->nearest(o, d, rng);
    if (h.obj < 0) return;
    const Mat& m = sc->mats[h.obj];
    const V3 col = sc->color(h);
    if (m.isDiff()) {
      grid.query(h.p, [&](int i) {
        HitPoint& hp = hps[size_t(i)];
        V3 dv = hp.p - h.p;
        if (hp.n.dot(h.n) > 1e-3 && dv.n2() <= hp.r2) {
          hp.newN++;
          hp.tao[0] += hp.wgt.x * flux.x * 0.3183098861837907;
          hp.tao[1] += hp.wgt.y * flux.y * 0.3183098861837907;
          hp.tao[2] += hp.wgt.z * flux.z * 0.3183098861837907;
        }
      });
    }
    // roulette one branch ~ lobe mean powers (the reference's biased pick,
    // Obj.h:30-45: no division by the branch probability)
    double pd = (m.diff.x + m.diff.y + m.diff.z) / 3;
    double pl = (m.refl.x + m.refl.y + m.refl.z) / 3;
    double pr = (m.refr.x + m.refr.y + m.refr.z) / 3;
    if (pd + pl + pr <= 0) return;
    double r = rng.uni() * (pd + pl + pr);
    V3 nf = col.mul(flux);
    if (r < pd) {
      photonTrace(h.p, rng.cosine(h.n), nf, dep + 1);
    } else if (r < pd + pl) {
      photonTrace(h.p, (d - h.n * (2 * d.dot(h.n))).unit(), nf, dep + 1);
    } else {
      double eta = h.inside ? m.refrn : 1.0 / m.refrn;
      V3 n = h.inside ? h.n * -1.0 : h.n;
      double ci = -n.dot(d);
      double cr2 = 1 - (1 - ci * ci) * eta * eta;
      V3 nd = cr2 > EPS ? (d * eta + n * (eta * ci - std::sqrt(cr2))).unit()
                        : (d - n * (2 * d.dot(n))).unit();
      photonTrace(h.p, nd, nf, dep + 1);
    }
  }
};

static int toInt(double x) {  // Raytracer.h:24-26 tone map
  double v = std::pow(1.0 - std::exp(-std::max(x, 0.0)), 1.0 / 2.2);
  return int(std::min(255.0, std::floor(v * 255.0 + 0.5)));
}

int main(int argc, char** argv) {
  const char* bpt = argc > 1 ? argv[1] : "assets/teapot.bpt";
  int res = argc > 2 ? std::atoi(argv[2]) : 512;
  int rounds = argc > 3 ? std::atoi(argv[3]) : 200;   // rounds of `onetime`
  int threads = argc > 4 ? std::atoi(argv[4]) : 4;
  const char* dump = (argc > 5 && std::strcmp(argv[5], "-")) ? argv[5] : nullptr;
  // round-3 crossval extensions (VERDICT item 6): textured transport and a
  // LIVE radius-shrink mode matching render/sppm.py:ppm_update exactly.
  const char* texbin = (argc > 6 && std::strcmp(argv[6], "-")) ? argv[6] : nullptr;
  int onetime = argc > 7 ? std::atoi(argv[7]) : 100;  // photons per round
  bool liveSppm = argc > 8 && std::strcmp(argv[8], "sppm") == 0;

  Scene sc;
  // The reference scene object list (Scene.h:116-157): 5 planes (left red,
  // right blue, back MIRROR, bottom, top), mirror + glass + diffuse spheres,
  // 32-patch teapot.  Colors = the flat per-object colors our scenes.full
  // uses when textures are disabled (Obj.h GetColor without texture).
  sc.planes = {{{1, 40.8, 81.6}, {1, 0, 0}},  {{99, 40.8, 81.6}, {1, 0, 0}},
               {{50, 40.8, 0}, {0, 0, 1}},    {{50, 0, 81.6}, {0, -1, 0}},
               {{50, 81.6, 81.6}, {0, 1, 0}}};
  sc.spheres = {{{27, 16.5, 47}, 16.5}, {{73, 16.5, 88}, 16.5}, {{50, 8.5, 60}, 8.5}};
  Mat WD{{0.75, 0.75, 0.75}, {}, {}, 0};
  Mat MI{{}, {0.999, 0.999, 0.999}, {}, 0};
  Mat RF{{}, {}, {0.999, 0.999, 0.999}, 1.5};
  sc.mats = {WD, WD, MI, WD, WD, MI, RF, WD, WD};
  sc.cols = {{0.75, 0.25, 0.25}, {0.25, 0.25, 0.75}, {0.75, 0.75, 0.75},
             {0.75, 0.75, 0.75}, {0.75, 0.75, 0.75},
             {0.999, 0.999, 0.999}, {0.999, 0.999, 0.999},
             {0.999, 0.999, 0.999}, {0.0, 0.999, 0.999}};

  // teapot.bpt with the reference placement: scale 4, swap-yz + rotY(90), +C
  std::ifstream f(bpt);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", bpt); return 1; }
  int np; f >> np;
  sc.bezLo = {1e20, 1e20, 1e20}; sc.bezHi = {-1e20, -1e20, -1e20};
  for (int p = 0; p < np; p++) {
    int m, n; f >> m >> n;
    Patch pa;
    for (int i = 0; i < 16; i++) {
      double x, y, z; f >> x >> y >> z;
      x *= 4; y *= 4; z *= 4;
      double sx = x, sy = z, sz = y;          // swap y/z
      double rx = sz, rz = -sx;               // rot 90 about y: (x,z)->(z,-x)
      V3 q{rx + 20, sy + 0, rz + 120};
      pa.P[i] = q;
    }
    pa.bound();
    sc.patches.push_back(pa);
    sc.bezLo.x = std::min(sc.bezLo.x, pa.lo.x); sc.bezLo.y = std::min(sc.bezLo.y, pa.lo.y); sc.bezLo.z = std::min(sc.bezLo.z, pa.lo.z);
    sc.bezHi.x = std::max(sc.bezHi.x, pa.hi.x); sc.bezHi.y = std::max(sc.bezHi.y, pa.hi.y); sc.bezHi.z = std::max(sc.bezHi.z, pa.hi.z);
  }

  // Optional texture pack (binary: int32 n; per tex int32 H, W, H*W*3
  // float32) dumped by scripts/crossval.py from the JAX procedural atlas;
  // object->texture ids follow scenes.full (Scene.h:131-156): walls 0,
  // floor 1, planet sphere 2, teapot 3.
  if (texbin) {
    std::ifstream tf(texbin, std::ios::binary);
    if (!tf) { std::fprintf(stderr, "cannot open %s\n", texbin); return 1; }
    int32_t n = 0;
    tf.read(reinterpret_cast<char*>(&n), 4);
    for (int i = 0; i < n; i++) {
      Tex t;
      int32_t hw[2];
      tf.read(reinterpret_cast<char*>(hw), 8);
      t.H = hw[0]; t.W = hw[1];
      t.d.resize(size_t(t.H) * t.W * 3);
      tf.read(reinterpret_cast<char*>(t.d.data()),
              std::streamsize(t.d.size() * sizeof(float)));
      sc.texs.push_back(std::move(t));
    }
    sc.objTex = {0, 0, -1, 1, 0, -1, -1, 2, 3};
  }

  // camera (main.cpp:22-27): pos (50,35,230), dir +(0,0.042612,-1), fov 50
  V3 cpos{50, 35, 230};
  V3 cdir = V3{0, 0.042612, -1}.unit();
  V3 up{0, 0, 1};
  V3 du = cdir.cross(up).unit();
  V3 dv = (cdir.cross(du) * -1.0).unit();
  double fl = 0.5 / std::tan(25.0 * 3.14159265358979 / 180.0);
  V3 fwd = cdir * fl;

  auto t0 = std::chrono::steady_clock::now();
  Tracer tr; tr.sc = &sc;
  tr.hps.reserve(size_t(res) * res * 2);
  for (int y = 0; y < res; y++)
    for (int x = 0; x < res; x++) {
      V3 d = (du * ((x + 0.5) / res - 0.5) + dv * ((y + 0.5) / res - 0.5) + fwd).unit();
      tr.eyeTrace(cpos, d, {1, 1, 1}, 0, y * res + x);
    }
  auto t1 = std::chrono::steady_clock::now();
  tr.grid.build(tr.hps);

  // photon phase: `rounds` rounds x 100 photons, over `threads` independent
  // tracers like the reference's 4 OpenMP threads (each owns its state).
  // Per-thread tao accumulators merge at the end (the reference's serial
  // canvas merge, Raytracer.h:449-458, hoisted to hit-point granularity).
  long totalPhotons = 0;
  size_t H = tr.hps.size();
  std::vector<double> taoSum(H * 3, 0.0);
  auto t2 = std::chrono::steady_clock::now();
  if (liveSppm) {
    // LIVE textbook shrink, single chain (threads ignored): after each
    // round of `onetime` photons, k = (N + 0.7 dN)/(N + dN); r2 *= k;
    // tao *= k; N += 0.7 dN — exactly render/sppm.py:ppm_update("sppm")
    // with matching round batching, so the two radius trajectories agree.
    for (int rd = 0; rd < rounds; rd++) {
      for (int j = 0; j < onetime; j++) {
        V3 d = tr.rng.sphere();
        tr.photonTrace(sc.lightPos, d, sc.lightCol * (4 * 3.14159265358979), 0);
        totalPhotons++;
      }
      for (auto& hp : tr.hps) {
        if (hp.newN <= 0) continue;
        double dN = hp.newN;
        double k = (hp.nphot + 0.7 * dN) / (hp.nphot + dN);
        hp.r2 *= k;
        hp.tao[0] *= k; hp.tao[1] *= k; hp.tao[2] *= k;
        hp.nphot += 0.7 * dN;
        hp.newN = 0;
      }
    }
    for (size_t i = 0; i < H; i++) {
      taoSum[3 * i + 0] = tr.hps[i].tao[0];
      taoSum[3 * i + 1] = tr.hps[i].tao[1];
      taoSum[3 * i + 2] = tr.hps[i].tao[2];
    }
  } else {
#ifdef _OPENMP
  omp_set_num_threads(threads);
#endif
#pragma omp parallel reduction(+ : totalPhotons)
  {
#ifdef _OPENMP
    int tid = omp_get_thread_num();
#else
    int tid = 0;
#endif
    Tracer local; local.sc = &sc; local.hps = tr.hps; local.grid = tr.grid;
    local.rng = Rng(uint64_t(9000 + tid));
#pragma omp for schedule(dynamic)
    for (int rd = 0; rd < rounds; rd++) {
      for (int j = 0; j < onetime; j++) {
        V3 d = local.rng.sphere();
        local.photonTrace(sc.lightPos, d, sc.lightCol * (4 * 3.14159265358979), 0);
        totalPhotons++;
      }
      for (auto& hp : local.hps) {  // reference update() pass (dead-code
        if (hp.newN <= 0) continue; // guard preserved: N starts 0)
        hp.newN = 0;
      }
    }
#pragma omp critical
    for (size_t i = 0; i < H; i++) {
      taoSum[3 * i + 0] += local.hps[i].tao[0];
      taoSum[3 * i + 1] += local.hps[i].tao[1];
      taoSum[3 * i + 2] += local.hps[i].tao[2];
    }
  }
  }
  auto t3 = std::chrono::steady_clock::now();

  if (dump) {
    // Linear radiance estimate (Raytracer.h:281-294): pic[px] +=
    // tao / (pi r^2 totalPhotons); radii never shrank (dead-code update).
    std::vector<float> pic(size_t(res) * res * 3, 0.0f);
    for (size_t i = 0; i < H; i++) {
      const HitPoint& hp = tr.hps[i];
      double s = 1.0 / (3.14159265358979 * hp.r2 * double(totalPhotons));
      pic[3 * size_t(hp.px) + 0] += float(taoSum[3 * i + 0] * s);
      pic[3 * size_t(hp.px) + 1] += float(taoSum[3 * i + 1] * s);
      pic[3 * size_t(hp.px) + 2] += float(taoSum[3 * i + 2] * s);
    }
    std::ofstream o(dump, std::ios::binary);
    o.write(reinterpret_cast<const char*>(pic.data()),
            std::streamsize(pic.size() * sizeof(float)));
    o.close();
    std::string ppm = std::string(dump) + ".ppm";
    std::ofstream po(ppm, std::ios::binary);
    po << "P6\n" << res << " " << res << "\n255\n";
    for (int y = res - 1; y >= 0; y--)   // vertical flip on write (Raytracer.h:467)
      for (int x = 0; x < res; x++) {
        size_t i = 3 * (size_t(y) * res + x);
        unsigned char rgb[3] = {(unsigned char)toInt(pic[i]),
                                (unsigned char)toInt(pic[i + 1]),
                                (unsigned char)toInt(pic[i + 2])};
        po.write(reinterpret_cast<const char*>(rgb), 3);
      }
  }

  double eye_s = std::chrono::duration<double>(t1 - t0).count();
  double photon_s = std::chrono::duration<double>(t3 - t2).count();
  std::printf(
      "{\"photons_per_s\": %.1f, \"eye_s\": %.3f, \"photon_s\": %.3f, "
      "\"hitpoints\": %zu, \"threads\": %d, \"rounds\": %d}\n",
      totalPhotons / photon_s, eye_s, photon_s, tr.hps.size(), threads, rounds);
  return 0;
}
