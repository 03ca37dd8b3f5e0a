// Shared forward-only number scanning for the native host-I/O components
// (fastio.cpp parser, evqueue.cpp streaming loader).
#pragma once

namespace fastio {

// Fast forward-only float parser (decimal + exponent); advances *p.
inline double parse_double(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == ',')) ++p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  double v = 0.0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10.0 + (*p++ - '0');
  if (p < end && *p == '.') {
    ++p;
    double scale = 0.1;
    while (p < end && *p >= '0' && *p <= '9') {
      v += (*p++ - '0') * scale;
      scale *= 0.1;
    }
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) eneg = (*p++ == '-');
    int ex = 0;
    while (p < end && *p >= '0' && *p <= '9') ex = ex * 10 + (*p++ - '0');
    double f = 1.0;
    while (ex >= 8) { f *= 1e8; ex -= 8; }
    while (ex-- > 0) f *= 10.0;
    v = eneg ? v / f : v * f;
  }
  return neg ? -v : v;
}

}  // namespace fastio
