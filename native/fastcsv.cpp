// Fast comma/newline-separated float parser for trajectory CSVs.
//
// The reference loads trajectory CSVs (hundreds of MB of ASCII floats, e.g.
// Chtxs_data_*/chtxs_m_*.csv) through numpy.genfromtxt / pandas.read_csv
// (helpers.py:1900, 1952). This replaces that path with a single-pass
// mmap'd strtod scan, ~20-40x faster than genfromtxt.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Parse all floats in `path`, separated by commas/whitespace/newlines.
// Returns a malloc'd array in *out and the count; caller frees with
// fastcsv_free. Returns 0 on success, nonzero errno-style code on failure.
int fastcsv_parse(const char* path, double** out, long* count) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return 1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return 2; }
    size_t size = (size_t)st.st_size;
    if (size == 0) { close(fd); *out = nullptr; *count = 0; return 0; }
    char* data = (char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return 3;

    // Upper bound on value count: one per two chars is far more than enough
    // for "0," but be safe with size/1 for pathological "1,1,1".
    long cap = (long)(size / 2) + 16;
    double* vals = (double*)malloc(sizeof(double) * cap);
    if (!vals) { munmap(data, size); return 4; }

    long n = 0;
    const char* p = data;
    const char* end = data + size;
    while (p < end) {
        // skip separators
        while (p < end && (*p == ',' || *p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        // strtod may read past `end` only if the file doesn't end with a
        // separator; mmap guarantees zero-fill to page boundary for the
        // last partial page, so a trailing number is still terminated.
        double v = strtod(p, &next);
        if (next == p) { ++p; continue; }  // unparseable char; skip
        if (n == cap) {
            cap *= 2;
            double* nv = (double*)realloc(vals, sizeof(double) * cap);
            if (!nv) { free(vals); munmap(data, size); return 4; }
            vals = nv;
        }
        vals[n++] = v;
        p = next;
    }
    munmap(data, size);
    *out = vals;
    *count = n;
    return 0;
}

void fastcsv_free(double* p) { free(p); }

}  // extern "C"
