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

    // mmap zero-fills the tail of a *partial* last page, so strtod on a
    // trailing number is normally NUL-terminated. When the file size is an
    // exact multiple of the page size that guarantee vanishes and a file
    // ending in a digit would make strtod read past the mapping. Copy the
    // final page into a NUL-terminated heap buffer and parse it separately;
    // tokens are assumed shorter than a page (true for any ASCII float).
    size_t pagesz = (size_t)sysconf(_SC_PAGESIZE);
    char* tail = nullptr;
    size_t tail_len = 0;
    const char* safe_end = data + size;
    if (size % pagesz == 0) {
        tail_len = size < pagesz ? size : pagesz;
        tail = (char*)malloc(tail_len + 1);
        if (!tail) { free(vals); munmap(data, size); return 4; }
        memcpy(tail, data + size - tail_len, tail_len);
        tail[tail_len] = '\0';
        safe_end = data + size - tail_len;
    }

    long n = 0;
    const char* p = data;
    // Pass 1: the mmap'd region up to safe_end. Only tokens *starting*
    // before safe_end are parsed here; a token straddling safe_end ends at a
    // separator inside the (still mapped) last page, so strtod stays in
    // bounds, and `p = next` then hands the remainder to pass 2.
    while (p < safe_end) {
        while (p < safe_end && (*p == ',' || *p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= safe_end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) { ++p; continue; }  // unparseable char; skip
        if (n == cap) {
            cap *= 2;
            double* nv = (double*)realloc(vals, sizeof(double) * cap);
            if (!nv) { free(vals); free(tail); munmap(data, size); return 4; }
            vals = nv;
        }
        vals[n++] = v;
        p = next;
    }
    // Pass 2: the NUL-terminated copy of the final page, resuming where
    // pass 1 stopped (p - safe_end >= 0 skips any part already consumed).
    if (tail) {
        const char* q = tail + (p - safe_end);
        const char* tend = tail + tail_len;
        while (q < tend) {
            while (q < tend && (*q == ',' || *q == ' ' || *q == '\n' || *q == '\r' || *q == '\t'))
                ++q;
            if (q >= tend) break;
            char* next = nullptr;
            double v = strtod(q, &next);
            if (next == q) { ++q; continue; }
            if (n == cap) {
                cap *= 2;
                double* nv = (double*)realloc(vals, sizeof(double) * cap);
                if (!nv) { free(vals); free(tail); munmap(data, size); return 4; }
                vals = nv;
            }
            vals[n++] = v;
            q = next;
        }
        free(tail);
    }
    munmap(data, size);
    *out = vals;
    *count = n;
    return 0;
}

void fastcsv_free(double* p) { free(p); }

}  // extern "C"
