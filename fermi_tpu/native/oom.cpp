// OOM diagnostics + rlimit lift for libfermi_native (reference
// utils.c:10-47).  Linked into the shared library; the static installer
// runs at dlopen.
#include "oom.h"

#include <new>

#ifdef __linux__
#include <sys/resource.h>
#include <unistd.h>
#endif

namespace fermi_native {

static long rss_mb() {
#ifdef __linux__
  FILE* f = fopen("/proc/self/statm", "r");
  if (!f) return -1;
  long total = 0, rss = 0;
  int ok = fscanf(f, "%ld %ld", &total, &rss);
  fclose(f);
  if (ok != 2) return -1;
  return rss * (sysconf(_SC_PAGESIZE) / 1024) / 1024;
#else
  return -1;
#endif
}

void oom_die(const char* what, size_t bytes) {
  fprintf(stderr,
          "[E::fermi-native] %s: out of memory requesting %zu bytes "
          "(RSS %ld MB)\n",
          what, bytes, rss_mb());
  fflush(stderr);
  abort();
}

namespace {
struct Install {
  Install() {
    std::set_new_handler([] { oom_die("operator new", 0); });
#ifdef __linux__
    // liftrlimit (utils.c:39-47): raise the soft address-space cap
    struct rlimit r;
    if (getrlimit(RLIMIT_AS, &r) == 0 && r.rlim_cur != r.rlim_max) {
      r.rlim_cur = r.rlim_max;
      setrlimit(RLIMIT_AS, &r);
    }
#endif
  }
};
static Install install_;
}  // namespace

}  // namespace fermi_native
