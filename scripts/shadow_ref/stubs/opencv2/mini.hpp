// Minimal CPU-only OpenCV-compatible stub for the shadow build of the
// reference renderer.  Implements exactly the API surface used by
// src/statistics + src/core/film: shared-data Mat, Vec, GpuMat that
// mirrors to host memory, PFM imread/imwrite, cvtColor, merge, glob,
// and a no-op cv::cuda::stat_denoiser.  Parity-artifact generation
// only; never shipped.
#ifndef MINI_OPENCV_HPP
#define MINI_OPENCV_HPP

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

// ---- type codes (match OpenCV's encoding) --------------------------------
#define CV_8U 0
#define CV_8S 1
#define CV_16U 2
#define CV_16S 3
#define CV_32S 4
#define CV_32F 5
#define CV_64F 6
#define CV_CN_SHIFT 3
#define CV_MAKETYPE(depth, cn) ((depth) + (((cn)-1) << CV_CN_SHIFT))
#define CV_8UC(n) CV_MAKETYPE(CV_8U, (n))
#define CV_8UC1 CV_8UC(1)
#define CV_32FC1 CV_MAKETYPE(CV_32F, 1)
#define CV_32FC3 CV_MAKETYPE(CV_32F, 3)
#define CV_32SC1 CV_MAKETYPE(CV_32S, 1)
#define CV_64FC1 CV_MAKETYPE(CV_64F, 1)
#define CV_64FC3 CV_MAKETYPE(CV_64F, 3)

typedef unsigned char uchar;

namespace cv {

inline int typeDepth(int type) { return type & 7; }
inline int typeChannels(int type) { return (type >> CV_CN_SHIFT) + 1; }
inline size_t depthSize(int depth) {
    switch (depth) {
        case CV_8U: case CV_8S: return 1;
        case CV_16U: case CV_16S: return 2;
        case CV_32S: case CV_32F: return 4;
        default: return 8;
    }
}

// ---- Vec -----------------------------------------------------------------
template <typename T, int N>
struct Vec {
    T v[N];
    Vec() { for (int i = 0; i < N; i++) v[i] = T(0); }
    Vec(T a) { for (int i = 0; i < N; i++) v[i] = a; }
    Vec(T a, T b, T c) { v[0] = a; if (N > 1) v[1] = b; if (N > 2) v[2] = c; }
    explicit Vec(const T *p) { for (int i = 0; i < N; i++) v[i] = p[i]; }
    T &operator[](int i) { return v[i]; }
    const T &operator[](int i) const { return v[i]; }
    Vec operator+(const Vec &o) const { Vec r; for (int i = 0; i < N; i++) r.v[i] = v[i] + o.v[i]; return r; }
    Vec operator-(const Vec &o) const { Vec r; for (int i = 0; i < N; i++) r.v[i] = v[i] - o.v[i]; return r; }
    Vec &operator+=(const Vec &o) { for (int i = 0; i < N; i++) v[i] += o.v[i]; return *this; }
    Vec &operator-=(const Vec &o) { for (int i = 0; i < N; i++) v[i] -= o.v[i]; return *this; }
    Vec operator*(T s) const { Vec r; for (int i = 0; i < N; i++) r.v[i] = v[i] * s; return r; }
    Vec operator/(T s) const { Vec r; for (int i = 0; i < N; i++) r.v[i] = v[i] / s; return r; }
};
template <typename T, int N>
inline Vec<T, N> operator*(T s, const Vec<T, N> &a) { return a * s; }

typedef Vec<float, 3> Vec3f;

template <typename T> struct TypeOf;
template <> struct TypeOf<uchar> { static const int value = CV_8U; };
template <> struct TypeOf<int> { static const int value = CV_32S; };
template <> struct TypeOf<float> { static const int value = CV_32F; };
template <> struct TypeOf<double> { static const int value = CV_64F; };
template <> struct TypeOf<Vec<float, 3>> { static const int value = CV_32FC3; };
template <> struct TypeOf<Vec<double, 3>> { static const int value = CV_64FC3; };

// ---- Mat (shared, contiguous) -------------------------------------------
class Mat {
  public:
    int rows = 0, cols = 0;
    uchar *data = nullptr;

    Mat() {}
    Mat(int r, int c, int type) { create(r, c, type); }
    Mat(int r, int c, int type, void *external) {
        rows = r; cols = c; type_ = type;
        data = (uchar *)external;  // non-owning view
    }
    template <typename T>
    Mat(const std::vector<T> &v) {
        create((int)v.size(), 1, TypeOf<T>::value);
        std::memcpy(data, v.data(), v.size() * sizeof(T));
    }

    void create(int r, int c, int type) {
        rows = r; cols = c; type_ = type;
        store_ = std::make_shared<std::vector<uchar>>(
            (size_t)r * c * elemSize1(type) * typeChannels(type), 0);
        data = store_->data();
    }

    static size_t elemSize1(int type) { return depthSize(typeDepth(type)); }
    int type() const { return type_; }
    int depth() const { return typeDepth(type_); }
    int channels() const { return typeChannels(type_); }
    size_t elemSize() const { return elemSize1(type_) * channels(); }
    size_t step() const { return (size_t)cols * elemSize(); }
    bool empty() const { return data == nullptr || rows == 0; }

    uchar *ptr(int row = 0) { return data + (size_t)row * step(); }
    const uchar *ptr(int row = 0) const { return data + (size_t)row * step(); }
    template <typename T> T *ptr(int row = 0) { return (T *)(data + (size_t)row * step()); }
    template <typename T> const T *ptr(int row = 0) const { return (const T *)(data + (size_t)row * step()); }

    // OpenCV's OutputArray accepts const refs from const containers;
    // mirror that with a const_cast (stub-only).
    void convertTo(const Mat &dstc, int rtype) const {
        Mat &dst = const_cast<Mat &>(dstc);
        int rdepth = typeDepth(rtype);
        int cn = channels();
        if (dst.empty() || dst.rows != rows || dst.cols != cols ||
            dst.depth() != rdepth || dst.channels() != cn)
            dst.create(rows, cols, CV_MAKETYPE(rdepth, cn));
        size_t n = (size_t)rows * cols * cn;
        for (size_t i = 0; i < n; i++) dst.setElem(i, getElem(i));
    }

    double getElem(size_t i) const {
        switch (depth()) {
            case CV_8U: return ((const uchar *)data)[i];
            case CV_32S: return ((const int *)data)[i];
            case CV_32F: return ((const float *)data)[i];
            case CV_64F: return ((const double *)data)[i];
            default: return 0.0;
        }
    }
    void setElem(size_t i, double v) {
        switch (depth()) {
            case CV_8U: ((uchar *)data)[i] = (uchar)v; break;
            case CV_32S: ((int *)data)[i] = (int)v; break;
            case CV_32F: ((float *)data)[i] = (float)v; break;
            case CV_64F: ((double *)data)[i] = v; break;
        }
    }

  protected:
    int type_ = CV_8U;
    std::shared_ptr<std::vector<uchar>> store_;
};

template <typename T>
class Mat_ : public Mat {
  public:
    Mat_() {}
    Mat_(int r, int c) : Mat(r, c, TypeOf<T>::value) {}
};

typedef Mat_<float> Mat1f;
typedef Mat_<int> Mat1i;
typedef Mat_<Vec3f> Mat3f;

// ---- imgproc / core free functions --------------------------------------
enum { COLOR_RGB2BGR = 4, COLOR_BGR2RGB = 4 };
enum { IMREAD_UNCHANGED = -1 };

inline void cvtColor(const Mat &src, Mat &dst, int /*code*/) {
    // Only RGB<->BGR swaps are requested: reverse the channel order.
    Mat out(src.rows, src.cols, src.type());
    int cn = src.channels();
    size_t npx = (size_t)src.rows * src.cols;
    if (src.depth() == CV_32F && cn == 3) {
        const float *s = (const float *)src.data;
        float *d = (float *)out.data;
        for (size_t i = 0; i < npx; i++) {
            d[3 * i] = s[3 * i + 2];
            d[3 * i + 1] = s[3 * i + 1];
            d[3 * i + 2] = s[3 * i];
        }
    } else {
        std::memcpy(out.data, src.data, npx * src.elemSize());
    }
    dst = out;
}

inline void merge(const std::vector<Mat> &mats, Mat &dst) {
    if (mats.empty()) return;
    int rows = mats[0].rows, cols = mats[0].cols, cn = 0;
    for (const Mat &m : mats) cn += m.channels();
    dst.create(rows, cols, CV_MAKETYPE(CV_32F, cn));
    float *d = (float *)dst.data;
    size_t npx = (size_t)rows * cols;
    int off = 0;
    for (const Mat &m : mats) {
        int mc = m.channels();
        const float *s = (const float *)m.data;
        for (size_t i = 0; i < npx; i++)
            for (int c = 0; c < mc; c++) d[i * cn + off + c] = s[i * mc + c];
        off += mc;
    }
}

// ---- PFM io --------------------------------------------------------------
inline bool imwrite(const std::string &filename, const Mat &img) {
    auto dot = filename.find_last_of('.');
    std::string ext = dot == std::string::npos ? "" : filename.substr(dot + 1);
    if (ext != "pfm") {
        std::cerr << "[mini-cv] imwrite: only .pfm supported, got "
                  << filename << std::endl;
        return false;
    }
    int cn = img.channels();
    if (img.depth() != CV_32F || (cn != 1 && cn != 3)) {
        std::cerr << "[mini-cv] imwrite: PFM needs CV_32F 1/3ch" << std::endl;
        return false;
    }
    std::ofstream f(filename, std::ios::binary);
    f << (cn == 3 ? "PF" : "Pf") << "\n"
      << img.cols << " " << img.rows << "\n" << "-1.0" << "\n";
    // PFM scanline order is bottom-up for negative scale.  Real
    // OpenCV's imwrite treats a 3-channel Mat as BGR and emits RGB
    // scanlines, so reverse the channel order here to match.
    if (cn == 3) {
        std::vector<float> row(img.cols * 3);
        for (int r = img.rows - 1; r >= 0; r--) {
            const float *src = img.ptr<float>(r);
            for (int c = 0; c < img.cols; c++) {
                row[3 * c] = src[3 * c + 2];
                row[3 * c + 1] = src[3 * c + 1];
                row[3 * c + 2] = src[3 * c];
            }
            f.write((const char *)row.data(), row.size() * 4);
        }
    } else {
        for (int r = img.rows - 1; r >= 0; r--)
            f.write((const char *)img.ptr(r), img.step());
    }
    return f.good();
}

inline Mat imread(const std::string &filename, int /*flags*/) {
    std::ifstream f(filename, std::ios::binary);
    if (!f) return Mat();
    std::string magic;
    f >> magic;
    if (magic != "PF" && magic != "Pf") {
        std::cerr << "[mini-cv] imread: only PFM supported" << std::endl;
        return Mat();
    }
    int w, h; double scale;
    f >> w >> h >> scale;
    f.get();  // single whitespace after header
    int cn = magic == "PF" ? 3 : 1;
    Mat img(h, w, CV_MAKETYPE(CV_32F, cn));
    for (int r = h - 1; r >= 0; r--)
        f.read((char *)img.ptr(r), img.step());
    if (scale > 0) {  // big-endian: byte-swap
        uint32_t *p = (uint32_t *)img.data;
        for (size_t i = 0; i < (size_t)h * w * cn; i++)
            p[i] = __builtin_bswap32(p[i]);
    }
    if (cn == 3) {  // real imread returns BGR from an RGB file
        float *d = (float *)img.data;
        for (size_t i = 0; i < (size_t)h * w; i++)
            std::swap(d[3 * i], d[3 * i + 2]);
    }
    return img;
}

inline void glob(const std::string &pattern, std::vector<std::string> &out,
                 bool /*recursive*/) {
    // Supports "<dir-prefix>*.pfm"-style patterns (one '*').
    auto star = pattern.find('*');
    std::string prefix = pattern.substr(0, star);
    std::string suffix = star == std::string::npos ? ""
                                                   : pattern.substr(star + 1);
    auto slash = prefix.find_last_of('/');
    std::string dir = slash == std::string::npos ? "." : prefix.substr(0, slash);
    std::string base = slash == std::string::npos ? prefix
                                                  : prefix.substr(slash + 1);
    std::error_code ec;
    for (auto &e : std::filesystem::directory_iterator(dir, ec)) {
        std::string name = e.path().filename().string();
        if (name.rfind(base, 0) == 0 && name.size() >= suffix.size() &&
            name.compare(name.size() - suffix.size(), suffix.size(),
                         suffix) == 0)
            out.push_back(e.path().string());
    }
    std::sort(out.begin(), out.end());
}

// ---- cuda namespace (host mirror) ----------------------------------------
namespace cuda {

class Stream {};

struct PtrStepSzb {
    uchar *data = nullptr;
    size_t step = 0;
    int cols = 0, rows = 0;
};

class GpuMat {
  public:
    GpuMat() {}
    GpuMat(int r, int c, int type) : host_(r, c, type) {}
    void upload(const Mat &m, Stream & = dummyStream()) {
        if (host_.empty() || host_.rows != m.rows || host_.cols != m.cols ||
            host_.type() != m.type())
            host_.create(m.rows, m.cols, m.type());
        std::memcpy(host_.data, m.data, (size_t)m.rows * m.step());
    }
    void download(Mat &m, Stream & = dummyStream()) const {
        if (!host_.empty() && !m.empty())
            std::memcpy(m.data, host_.data, (size_t)host_.rows * host_.step());
    }
    int channels() const { return host_.channels(); }
    int rows() const { return host_.rows; }
    operator PtrStepSzb() const {
        PtrStepSzb p;
        p.data = host_.data;
        p.step = host_.empty() ? 0 : host_.step();
        p.cols = host_.cols;
        p.rows = host_.rows;
        return p;
    }

  private:
    static Stream &dummyStream() { static Stream s; return s; }
    mutable Mat host_;
};

namespace stat_denoiser {
inline void setup() {}
template <typename T, typename... A> inline void filter(A &&...) {
    std::cerr << "[mini-cv] stat_denoiser::filter is a no-op in the "
                 "shadow CPU build (render raw statistics only)"
              << std::endl;
}
template <typename T, typename... A>
inline void calculateMeanVars(A &&...) {}
inline void synchronize(Stream &) {}
}  // namespace stat_denoiser

}  // namespace cuda
}  // namespace cv

#endif  // MINI_OPENCV_HPP
