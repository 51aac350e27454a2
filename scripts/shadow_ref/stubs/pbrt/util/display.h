// Stub of the vendored pbrt-v4 display client (shadow build: no tev).
#ifndef MINI_PBRTV4_DISPLAY_H
#define MINI_PBRTV4_DISPLAY_H
#include <string>
#include <vector>
namespace pbrtv4 {
inline void ConnectToDisplayServer(const std::string &) {}
inline void DisconnectFromDisplayServer() {}
inline void DisplayStatic(const std::string &, int, int, const float *,
                          const std::vector<std::string> &) {}
}
#endif
