// Native scalar SGP4/SDP4 propagate — the single-point latency engine
// behind api.Satrec.sgp4 loops (reference: the compiled scalar loop
// path, README.md:84-86 at 2.5M props/s; src/Sgp4.zig:419-603 +
// src/Sdp4.zig:881-970).
//
// A C++ translation of this package's OWN scalar transcription of the
// published Vallado algorithm (astroz_tpu/ops/scalar.py — AIAA
// 2006-6753): init stays in Python (one-time), the per-call hot path
// runs here on a pre-packed element vector. Parity with ops/scalar.py
// is exact-ULP-level and fuzz-tested in tests/test_native.py.

#include <cmath>

#include "scalar_fields.h"  // packed field-vector layout (enum F)

namespace {

constexpr double TWOPI = 6.283185307179586476925286766559;

// dspace: resonance integration + deep secular (ops/scalar.py:511-596)
void dspace(const double* s, double t, double& em, double& argpm,
            double& inclm, double& nodem, double& mm, double& nm) {
  const double fasx2 = 0.13130908, fasx4 = 2.8843198, fasx6 = 0.37448087;
  const double g22 = 5.7686396, g32 = 0.95240898;
  const double g44 = 1.8014998, g52 = 1.0508330, g54 = 4.4108898;
  const double rptim = 4.37526908801129966e-3;
  const double stepp = 720.0, stepn = -720.0, step2 = 259200.0;

  const double theta = std::fmod(s[GSTO] + t * rptim, TWOPI);
  em += s[DEDT] * t;
  inclm += s[DIDT] * t;
  argpm += s[DOMDT] * t;
  nodem += s[DNODT] * t;
  mm += s[DMDT] * t;

  nm = s[NO_UNKOZAI];
  if (s[IREZ] != 0.0) {
    // fresh integration from epoch (atime = 0 restart semantics —
    // same as ops/scalar.py's stateless call with atime=0)
    double atime = 0.0;
    double xni = s[NO_UNKOZAI];
    double xli = s[XLAMO];
    const double delt = t > 0.0 ? stepp : stepn;

    double xndt = 0.0, xldot = 0.0, xnddt = 0.0, ft = 0.0;
    for (;;) {
      if (s[IREZ] != 2.0) {
        xndt = s[DEL1] * std::sin(xli - fasx2)
             + s[DEL2] * std::sin(2.0 * (xli - fasx4))
             + s[DEL3] * std::sin(3.0 * (xli - fasx6));
        xldot = xni + s[XFACT];
        xnddt = s[DEL1] * std::cos(xli - fasx2)
              + 2.0 * s[DEL2] * std::cos(2.0 * (xli - fasx4))
              + 3.0 * s[DEL3] * std::cos(3.0 * (xli - fasx6));
        xnddt *= xldot;
      } else {
        const double xomi = s[ARGPO] + s[ARGPDOT] * atime;
        const double x2omi = xomi + xomi;
        const double x2li = xli + xli;
        xndt = s[D2201] * std::sin(x2omi + xli - g22)
             + s[D2211] * std::sin(xli - g22)
             + s[D3210] * std::sin(xomi + xli - g32)
             + s[D3222] * std::sin(-xomi + xli - g32)
             + s[D4410] * std::sin(x2omi + x2li - g44)
             + s[D4422] * std::sin(x2li - g44)
             + s[D5220] * std::sin(xomi + xli - g52)
             + s[D5232] * std::sin(-xomi + xli - g52)
             + s[D5421] * std::sin(xomi + x2li - g54)
             + s[D5433] * std::sin(-xomi + x2li - g54);
        xldot = xni + s[XFACT];
        xnddt = s[D2201] * std::cos(x2omi + xli - g22)
              + s[D2211] * std::cos(xli - g22)
              + s[D3210] * std::cos(xomi + xli - g32)
              + s[D3222] * std::cos(-xomi + xli - g32)
              + s[D5220] * std::cos(xomi + xli - g52)
              + s[D5232] * std::cos(-xomi + xli - g52)
              + 2.0 * (s[D4410] * std::cos(x2omi + x2li - g44)
                       + s[D4422] * std::cos(x2li - g44)
                       + s[D5421] * std::cos(xomi + x2li - g54)
                       + s[D5433] * std::cos(-xomi + x2li - g54));
        xnddt *= xldot;
      }
      if (std::fabs(t - atime) >= stepp) {
        xli += xldot * delt + xndt * step2;
        xni += xndt * delt + xnddt * step2;
        atime += delt;
      } else {
        ft = t - atime;
        break;
      }
    }

    nm = xni + xndt * ft + xnddt * ft * ft * 0.5;
    const double xl = xli + xldot * ft + xndt * ft * ft * 0.5;
    double dndt;
    if (s[IREZ] != 1.0) {
      mm = xl - 2.0 * nodem + 2.0 * theta;
      dndt = nm - s[NO_UNKOZAI];
    } else {
      mm = xl - nodem - argpm + theta;
      dndt = nm - s[NO_UNKOZAI];
    }
    nm = s[NO_UNKOZAI] + dndt;
  }
}

// dpper: lunisolar periodics, non-init branch (ops/scalar.py:111-190)
void dpper(const double* s, double t, double& ep, double& inclp,
           double& nodep, double& argpp, double& mp) {
  const double zns = 1.19459e-5, zes = 0.01675;
  const double znl = 1.5835218e-4, zel = 0.05490;

  double zm = s[ZMOS] + zns * t;
  double zf = zm + 2.0 * zes * std::sin(zm);
  double sinzf = std::sin(zf);
  double f2 = 0.5 * sinzf * sinzf - 0.25;
  double f3 = -0.5 * sinzf * std::cos(zf);
  const double ses = s[SE2] * f2 + s[SE3] * f3;
  const double sis = s[SI2] * f2 + s[SI3] * f3;
  const double sls = s[SL2] * f2 + s[SL3] * f3 + s[SL4] * sinzf;
  const double sghs = s[SGH2] * f2 + s[SGH3] * f3 + s[SGH4] * sinzf;
  const double shs = s[SH2] * f2 + s[SH3] * f3;

  zm = s[ZMOL] + znl * t;
  zf = zm + 2.0 * zel * std::sin(zm);
  sinzf = std::sin(zf);
  f2 = 0.5 * sinzf * sinzf - 0.25;
  f3 = -0.5 * sinzf * std::cos(zf);
  const double sel = s[EE2] * f2 + s[E3] * f3;
  const double sil = s[XI2] * f2 + s[XI3] * f3;
  const double sll = s[XL2] * f2 + s[XL3] * f3 + s[XL4] * sinzf;
  const double sghl = s[XGH2] * f2 + s[XGH3] * f3 + s[XGH4] * sinzf;
  const double shll = s[XH2] * f2 + s[XH3] * f3;

  double pe = ses + sel - s[PEO];
  double pinc = sis + sil - s[PINCO];
  double pl = sls + sll - s[PLO];
  double pgh = sghs + sghl - s[PGHO];
  double ph = shs + shll - s[PHO];

  inclp += pinc;
  ep += pe;
  const double sinip = std::sin(inclp);
  const double cosip = std::cos(inclp);
  if (inclp >= 0.2) {
    ph /= sinip;
    pgh -= cosip * ph;
    argpp += pgh;
    nodep += ph;
    mp += pl;
  } else {
    // Lyddane modification ('i' operation mode)
    const double sinop = std::sin(nodep);
    const double cosop = std::cos(nodep);
    double alfdp = sinip * sinop;
    double betdp = sinip * cosop;
    alfdp += ph * cosop + pinc * cosip * sinop;
    betdp += -ph * sinop + pinc * cosip * cosop;
    nodep = std::fmod(nodep, TWOPI);
    double xls = mp + argpp + cosip * nodep;
    xls += pl + pgh - pinc * nodep * sinip;
    const double xnoh = nodep;
    nodep = std::atan2(alfdp, betdp);
    if (std::fabs(xnoh - nodep) > M_PI) {
      if (nodep < xnoh)
        nodep += TWOPI;
      else
        nodep -= TWOPI;
    }
    mp += pl;
    argpp = xls - mp - cosip * nodep;
  }
}

}  // namespace

extern "C" {

// Propagate one satellite to tsince minutes past epoch. Writes
// out6 = [rx, ry, rz, vx, vy, vz] (km, km/s); returns the python-sgp4
// error code (0 = ok; errored output is zero-filled).
int astroz_scalar_sgp4(const double* s, double tsince, double* out6) {
  for (int i = 0; i < 6; ++i) out6[i] = 0.0;
  const double temp4 = 1.5e-12;
  const double vkmpersec = s[RADIUSEARTHKM] * s[XKE] / 60.0;
  const double t = tsince;

  const double xmdf = s[MO] + s[MDOT] * t;
  const double argpdf = s[ARGPO] + s[ARGPDOT] * t;
  const double nodedf = s[NODEO] + s[NODEDOT] * t;
  double argpm = argpdf;
  double mm = xmdf;
  const double t2 = t * t;
  double nodem = nodedf + s[NODECF] * t2;
  double tempa = 1.0 - s[CC1] * t;
  double tempe = s[BSTAR] * s[CC4] * t;
  double templ = s[T2COF] * t2;

  if (s[ISIMP] != 1.0) {
    const double delomg = s[OMGCOF] * t;
    const double delmtemp = 1.0 + s[ETA] * std::cos(xmdf);
    const double delm =
        s[XMCOF] * (delmtemp * delmtemp * delmtemp - s[DELMO]);
    const double temp = delomg + delm;
    mm = xmdf + temp;
    argpm = argpdf - temp;
    const double t3 = t2 * t;
    const double t4 = t3 * t;
    tempa = tempa - s[D2] * t2 - s[D3] * t3 - s[D4] * t4;
    tempe = tempe + s[BSTAR] * s[CC5] * (std::sin(mm) - s[SINMAO]);
    templ = templ + s[T3COF] * t3 + t4 * (s[T4COF] + t * s[T5COF]);
  }

  double nm = s[NO_UNKOZAI];
  double em = s[ECCO];
  double inclm = s[INCLO];
  if (s[DEEP] != 0.0)
    dspace(s, t, em, argpm, inclm, nodem, mm, nm);

  if (nm <= 0.0) return 2;
  // x^(2/3) = cbrt(x)^2 and x^1.5 = x*sqrt(x): each replaces a generic
  // ~100 ns pow call; differs from pow by <=2 ulp (parity gate 1e-9 km)
  const double cb = std::cbrt(s[XKE] / nm);
  const double am = cb * cb * tempa * tempa;
  nm = s[XKE] / (am * std::sqrt(am));
  em -= tempe;
  if (em >= 1.0 || em < -0.001) return 1;
  if (em < 1.0e-6) em = 1.0e-6;
  mm += s[NO_UNKOZAI] * templ;
  double xlm = mm + argpm + nodem;

  nodem = std::fmod(nodem, TWOPI);
  argpm = std::fmod(argpm, TWOPI);
  xlm = std::fmod(xlm, TWOPI);
  mm = std::fmod(xlm - argpm - nodem, TWOPI);

  double ep = em;
  double xincp = inclm;
  double argpp = argpm;
  double nodep = nodem;
  double mp = mm;
  double sinip = std::sin(xincp);
  double cosip = std::cos(xincp);
  double aycof = s[AYCOF];
  double xlcof = s[XLCOF];
  double con41 = s[CON41];
  double x1mth2 = s[X1MTH2];
  double x7thm1 = s[X7THM1];
  if (s[DEEP] != 0.0) {
    dpper(s, t, ep, xincp, nodep, argpp, mp);
    if (xincp < 0.0) {
      xincp = -xincp;
      nodep += M_PI;
      argpp -= M_PI;
    }
    if (ep < 0.0 || ep > 1.0) return 3;
    sinip = std::sin(xincp);
    cosip = std::cos(xincp);
    aycof = -0.5 * s[J3OJ2] * sinip;
    if (std::fabs(cosip + 1.0) > 1.5e-12)
      xlcof = -0.25 * s[J3OJ2] * sinip * (3.0 + 5.0 * cosip)
              / (1.0 + cosip);
    else
      xlcof = -0.25 * s[J3OJ2] * sinip * (3.0 + 5.0 * cosip) / temp4;
  }

  const double axnl = ep * std::cos(argpp);
  double temp = 1.0 / (am * (1.0 - ep * ep));
  const double aynl = ep * std::sin(argpp) + temp * aycof;
  const double xl = mp + argpp + nodep + temp * xlcof * axnl;

  const double u = std::fmod(xl - nodep, TWOPI);
  double eo1 = u;
  double tem5 = 9999.9;
  double sineo1 = 0.0, coseo1 = 0.0;
  for (int ktr = 1; std::fabs(tem5) >= 1.0e-12 && ktr <= 10; ++ktr) {
    sineo1 = std::sin(eo1);
    coseo1 = std::cos(eo1);
    tem5 = 1.0 - coseo1 * axnl - sineo1 * aynl;
    tem5 = (u - aynl * coseo1 + axnl * sineo1 - eo1) / tem5;
    if (std::fabs(tem5) >= 0.95) tem5 = tem5 > 0.0 ? 0.95 : -0.95;
    eo1 += tem5;
  }

  const double ecose = axnl * coseo1 + aynl * sineo1;
  const double esine = axnl * sineo1 - aynl * coseo1;
  const double el2 = axnl * axnl + aynl * aynl;
  const double pl = am * (1.0 - el2);
  if (pl < 0.0) return 4;

  const double rl = am * (1.0 - ecose);
  const double rdotl = std::sqrt(am) * esine / rl;
  const double rvdotl = std::sqrt(pl) / rl;
  const double betal = std::sqrt(1.0 - el2);
  temp = esine / (1.0 + betal);
  const double sinu = am / rl * (sineo1 - aynl - axnl * temp);
  const double cosu = am / rl * (coseo1 - axnl + aynl * temp);
  double su = std::atan2(sinu, cosu);
  const double sin2u = (cosu + cosu) * sinu;
  const double cos2u = 1.0 - 2.0 * sinu * sinu;
  temp = 1.0 / pl;
  const double temp1 = 0.5 * s[J2] * temp;
  const double temp2 = temp1 * temp;

  if (s[DEEP] != 0.0) {
    const double cosisq = cosip * cosip;
    con41 = 3.0 * cosisq - 1.0;
    x1mth2 = 1.0 - cosisq;
    x7thm1 = 7.0 * cosisq - 1.0;
  }

  const double mrt = rl * (1.0 - 1.5 * temp2 * betal * con41)
                     + 0.5 * temp1 * x1mth2 * cos2u;
  su -= 0.25 * temp2 * x7thm1 * sin2u;
  const double xnode = nodep + 1.5 * temp2 * cosip * sin2u;
  const double xinc = xincp + 1.5 * temp2 * cosip * sinip * cos2u;
  const double mvt = rdotl - nm * temp1 * x1mth2 * sin2u / s[XKE];
  const double rvdot =
      rvdotl + nm * temp1 * (x1mth2 * cos2u + 1.5 * con41) / s[XKE];

  const double sinsu = std::sin(su);
  const double cossu = std::cos(su);
  const double snod = std::sin(xnode);
  const double cnod = std::cos(xnode);
  const double sini = std::sin(xinc);
  const double cosi = std::cos(xinc);
  const double xmx = -snod * cosi;
  const double xmy = cnod * cosi;
  const double ux = xmx * sinsu + cnod * cossu;
  const double uy = xmy * sinsu + snod * cossu;
  const double uz = sini * sinsu;
  const double vx = xmx * cossu - cnod * sinsu;
  const double vy = xmy * cossu - snod * sinsu;
  const double vz = sini * cossu;

  if (mrt < 1.0) return 6;
  out6[0] = mrt * ux * s[RADIUSEARTHKM];
  out6[1] = mrt * uy * s[RADIUSEARTHKM];
  out6[2] = mrt * uz * s[RADIUSEARTHKM];
  out6[3] = (mvt * ux + rvdot * vx) * vkmpersec;
  out6[4] = (mvt * uy + rvdot * vy) * vkmpersec;
  out6[5] = (mvt * uz + rvdot * vz) * vkmpersec;
  return 0;
}

// Batch form over a tsince array — amortizes the call overhead for
// sgp4_tsince-style loops (one crossing per array, not per point).
long long astroz_scalar_sgp4_array(const double* s, const double* tsince,
                                   long long n, double* out, int* err) {
  for (long long i = 0; i < n; ++i)
    err[i] = astroz_scalar_sgp4(s, tsince[i], out + 6 * i);
  return n;
}

}  // extern "C"
