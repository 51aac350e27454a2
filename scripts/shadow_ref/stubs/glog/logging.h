// Minimal glog-compatible stub for the shadow CPU build of the
// reference renderer (parity-artifact generation only; not shipped).
#ifndef MINI_GLOG_LOGGING_H
#define MINI_GLOG_LOGGING_H

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

inline int FLAGS_stderrthreshold = 1;
inline const char *FLAGS_log_dir = "";
inline bool FLAGS_logtostderr = false;
inline int FLAGS_minloglevel = 0;
inline int FLAGS_v = 0;

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
inline void InstallFailureSignalHandler() {}
typedef int LogSeverity;
}  // namespace google

// Severities.
#define GLOG_INFO 0
#define GLOG_WARNING 1
#define GLOG_ERROR 2
#define GLOG_FATAL 3

namespace miniglog {

class LogMessage {
  public:
    LogMessage(int severity) : severity_(severity) {}
    ~LogMessage() {
        if (severity_ >= GLOG_WARNING)
            std::cerr << stream_.str() << std::endl;
        if (severity_ >= GLOG_FATAL) std::abort();
    }
    std::ostream &stream() { return stream_; }

  private:
    int severity_;
    std::ostringstream stream_;
};

class NullStream {
  public:
    template <typename T>
    NullStream &operator<<(const T &) { return *this; }
    NullStream &operator<<(std::ostream &(*)(std::ostream &)) {
        return *this;
    }
};

struct Voidify {
    void operator&(std::ostream &) {}
    void operator&(NullStream &) {}
};

}  // namespace miniglog

#define LOG(severity) miniglog::LogMessage(GLOG_##severity).stream()
#define LOG_IF(severity, cond) \
    !(cond) ? (void)0 : miniglog::Voidify() & LOG(severity)
#define LOG_EVERY_N(severity, n) LOG(severity)
#define VLOG(n) miniglog::NullStream()
#define VLOG_IS_ON(n) false
#define DLOG(severity) miniglog::NullStream()

#define CHECK(cond) \
    (cond) ? (void)0 \
           : miniglog::Voidify() & LOG(FATAL) << "Check failed: " #cond " "
#define CHECK_OP(a, b, op) CHECK((a)op(b))
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_NOTNULL(p) (p)

#ifdef NDEBUG
#define DCHECK(cond) miniglog::NullStream()
#define DCHECK_EQ(a, b) DCHECK((a) == (b))
#define DCHECK_NE(a, b) DCHECK((a) != (b))
#define DCHECK_LE(a, b) DCHECK((a) <= (b))
#define DCHECK_LT(a, b) DCHECK((a) < (b))
#define DCHECK_GE(a, b) DCHECK((a) >= (b))
#define DCHECK_GT(a, b) DCHECK((a) > (b))
#else
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#endif

namespace google {
using LogMessage = miniglog::LogMessage;
}

#endif  // MINI_GLOG_LOGGING_H
