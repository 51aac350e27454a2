// Stub float-EXR writer API (shadow build): OutputFile ctor throws so
// the reference's try/catch reports EXR as unsupported at runtime.
#ifndef MINI_IMF_OUTPUT_FILE_H
#define MINI_IMF_OUTPUT_FILE_H

#include <map>
#include <stdexcept>
#include <string>

#include "ImfRgbaFile.h"

namespace Imf {

enum PixelType { UINT = 0, HALF = 1, FLOAT = 2 };

struct Channel {
    PixelType type;
    Channel(PixelType t = FLOAT) : type(t) {}
};

class ChannelList {
  public:
    void insert(const char *name, const Channel &c) { m_[name] = c; }

  private:
    std::map<std::string, Channel> m_;
};

class Header {
  public:
    Header(int, int) {}
    ChannelList &channels() { return ch_; }

  private:
    ChannelList ch_;
};

struct Slice {
    Slice(PixelType, char *, size_t, size_t) {}
};

class FrameBuffer {
  public:
    void insert(const char *, const Slice &) {}
};

class OutputFile {
  public:
    OutputFile(const char *, const Header &) {
        throw std::runtime_error("EXR unsupported in shadow build");
    }
    void setFrameBuffer(const FrameBuffer &) {}
    void writePixels(int) {}
};

}  // namespace Imf

#endif
