// Out-of-memory hygiene for the native engines (reference utils.c:10-47:
// xmalloc prints a diagnostic instead of a bare abort; liftrlimit raises
// the address-space cap to the hard limit).  One translation unit
// (oom.cpp) installs a std::new_handler so std::vector growth failures
// also die with a message instead of an unexplained std::bad_alloc.
#pragma once
#include <cstdio>
#include <cstdlib>

namespace fermi_native {
void oom_die(const char* what, size_t bytes);
}

// checked malloc: null return (with nonzero size) prints the requesting
// site + size + current RSS, then aborts
static inline void* fx_malloc(size_t bytes, const char* what) {
  void* p = malloc(bytes);
  if (!p && bytes) fermi_native::oom_die(what, bytes);
  return p;
}
