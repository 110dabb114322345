// Fast comma/newline-separated float parser for trajectory CSVs.
//
// The reference loads trajectory CSVs (hundreds of MB of ASCII floats, e.g.
// Chtxs_data_*/chtxs_m_*.csv) through numpy.genfromtxt / pandas.read_csv
// (helpers.py:1900, 1952). This replaces that path with an mmap'd strtod
// scan, ~20-40x faster than genfromtxt single-threaded, parsed in parallel
// across chunks for multi-GB files (fastcsv_parse_mt).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

inline bool is_sep(char c) {
    return c == ',' || c == ' ' || c == '\n' || c == '\r' || c == '\t';
}

// Growable per-chunk output buffer. Cache-line aligned: the hot counters
// (n, and the vals pointer) are written per parsed value from different
// threads — adjacent Bufs in a vector would false-share otherwise.
struct alignas(64) Buf {
    double* vals = nullptr;
    long n = 0;
    long cap = 0;
    int rc = 0;
    char pad_[64 - sizeof(double*) - 2 * sizeof(long) - sizeof(int)];

    bool reserve(long want) {
        if (want <= cap) return true;
        double* nv = (double*)realloc(vals, sizeof(double) * want);
        if (!nv) { rc = 4; return false; }
        vals = nv;
        cap = want;
        return true;
    }

    bool push(double v) {
        if (n == cap && !reserve(cap ? cap * 2 : 4096)) return false;
        vals[n++] = v;
        return true;
    }
};

// Parse every token STARTING in [p, end); strtod may read past `end` into
// still-mapped bytes (it stops at the first separator), which is exactly how
// chunk boundaries hand straddling tokens to the chunk that owns their start.
void parse_range(const char* p, const char* end, Buf* b) {
    // Preallocate for the common dense-CSV case (ASCII doubles are >= 2
    // chars + separator) so the hot loop almost never reallocs.
    if (end > p && !b->reserve((long)((end - p) / 3) + 64)) return;
    while (p < end) {
        while (p < end && is_sep(*p)) ++p;
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) { ++p; continue; }  // unparseable char; skip
        if (!b->push(v)) return;
        p = next;
    }
}

}  // namespace

extern "C" {

// Parse all floats in `path`, separated by commas/whitespace/newlines, using
// up to `max_threads` worker threads (<=1 means single-threaded; 0 picks the
// hardware concurrency). Returns a malloc'd array in *out and the count;
// caller frees with fastcsv_free. Returns 0 on success, nonzero code on
// failure. Results are bit-identical to the single-threaded scan: chunk
// boundaries are aligned so each token is parsed exactly once, in order.
int fastcsv_parse_mt(const char* path, double** out, long* count,
                     int max_threads) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return 1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return 2; }
    size_t size = (size_t)st.st_size;
    if (size == 0) { close(fd); *out = nullptr; *count = 0; return 0; }
    char* data = (char*)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return 3;

    // mmap zero-fills the tail of a *partial* last page, so strtod on a
    // trailing number is normally NUL-terminated. When the file size is an
    // exact multiple of the page size that guarantee vanishes and a file
    // ending in a digit would make strtod read past the mapping. Split the
    // scan at one past the LAST separator in the file: every token starting
    // before that point also ends before it (a separator terminates it), so
    // the mapped scan never reads past the mapping, and the remainder is
    // parsed from a NUL-terminated heap copy with no dedup heuristics.
    size_t pagesz = (size_t)sysconf(_SC_PAGESIZE);
    char* tail = nullptr;
    size_t tail_len = 0;
    const char* safe_end = data + size;
    if (size % pagesz == 0) {
        const char* q = data + size;
        while (q > data && !is_sep(*(q - 1))) --q;
        safe_end = q;
        tail_len = size - (size_t)(safe_end - data);
        if (tail_len) {
            tail = (char*)malloc(tail_len + 1);
            if (!tail) { munmap(data, size); return 4; }
            memcpy(tail, safe_end, tail_len);
            tail[tail_len] = '\0';
        }
    }

    // Pick a thread count: one thread per ~8 MB. Auto (0) is capped by the
    // hardware concurrency; an explicit request is honored (up to 64) so the
    // chunked path is exercisable on any host.
    long hw = (long)std::thread::hardware_concurrency();
    if (hw < 1) hw = 1;
    long want = max_threads == 0 ? hw : (long)max_threads;
    if (want > 64) want = 64;
    // auto mode also requires enough data to be worth a thread (~8 MB each)
    long by_size = max_threads == 0 ? (long)(size / (8u << 20)) + 1
                                    : (long)size;
    long T = want < by_size ? want : by_size;
    if (T < 1) T = 1;

    // Chunk boundaries: begin[0] = data; begin[i>0] = one past the first
    // separator at/after data + i*size/T (so a token straddling the raw
    // split belongs to the chunk its START is in). All within [data,
    // safe_end]; the copied tail page is parsed serially afterwards.
    size_t scan_len = (size_t)(safe_end - data);
    std::vector<const char*> begin(T + 1);
    begin[0] = data;
    begin[T] = safe_end;
    for (long i = 1; i < T; ++i) {
        const char* q = data + (scan_len * (size_t)i) / (size_t)T;
        while (q < safe_end && !is_sep(*q)) ++q;
        if (q < safe_end) ++q;  // step past the separator
        begin[i] = q;
    }

    std::vector<Buf> bufs(T);
    if (T == 1) {
        parse_range(begin[0], begin[1], &bufs[0]);
    } else {
        std::vector<std::thread> workers;
        workers.reserve(T);
        for (long i = 0; i < T; ++i)
            workers.emplace_back(parse_range, begin[i], begin[i + 1], &bufs[i]);
        for (auto& w : workers) w.join();
    }

    // The NUL-terminated copy of everything past the last separator: no
    // token crosses safe_end (see above), so the copy is parsed wholesale.
    Buf tailbuf;
    if (tail) {
        parse_range(tail, tail + tail_len, &tailbuf);
        free(tail);
    }

    long total = tailbuf.n;
    int rc = tailbuf.rc;
    for (auto& b : bufs) { total += b.n; rc = rc ? rc : b.rc; }
    if (rc != 0) {
        for (auto& b : bufs) free(b.vals);
        free(tailbuf.vals);
        munmap(data, size);
        return rc;
    }
    double* vals = (double*)malloc(sizeof(double) * (total ? total : 1));
    if (!vals) {
        for (auto& b : bufs) free(b.vals);
        free(tailbuf.vals);
        munmap(data, size);
        return 4;
    }
    long off = 0;
    for (auto& b : bufs) {
        if (b.n) memcpy(vals + off, b.vals, sizeof(double) * b.n);
        off += b.n;
        free(b.vals);
    }
    if (tailbuf.n) memcpy(vals + off, tailbuf.vals, sizeof(double) * tailbuf.n);
    free(tailbuf.vals);

    munmap(data, size);
    *out = vals;
    *count = total;
    return 0;
}

// Single-threaded entry point (back-compat).
int fastcsv_parse(const char* path, double** out, long* count) {
    return fastcsv_parse_mt(path, out, count, 1);
}

void fastcsv_free(double* p) { free(p); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Multithreaded CSV WRITER: the inverse of the parser. Formats `count`
// doubles as comma-separated shortest-round-trip ASCII (std::to_chars,
// C++17) — the layout the reference produces with ndarray.tofile(sep=',')
// (Schnak_FCT_PDECO_refactored.py:271). Values survive a write+parse
// round trip bit-identically; chunks are formatted in parallel (one
// worker per ~4 MB of output) and written sequentially in order, so the
// file is independent of the thread count.
// ---------------------------------------------------------------------------

#include <charconv>
#include <string>

namespace {

void format_range(const double* vals, long lo, long hi, bool lead_sep,
                  std::string* out) {
    out->reserve((size_t)(hi - lo) * 26 + 2);
    char tmp[40];
    for (long i = lo; i < hi; ++i) {
        if (i > lo || lead_sep) out->push_back(',');
        auto res = std::to_chars(tmp, tmp + sizeof(tmp), vals[i]);
        out->append(tmp, res.ptr);
    }
}

}  // namespace

extern "C" {

// Write `count` doubles to `path` as one comma-separated line.
// `append` != 0 opens in append mode; `lead_sep` != 0 emits a leading
// comma before the first value (the streaming-chunk continuation of
// io/csvio.append_trajectory_csv). Returns 0 on success.
int fastcsv_write_mt(const double* vals, long count, const char* path,
                     int max_threads, int append, int lead_sep) {
    FILE* f = fopen(path, append ? "ab" : "wb");
    if (!f) return 1;
    if (count <= 0) { fclose(f); return 0; }

    long hw = (long)std::thread::hardware_concurrency();
    if (hw < 1) hw = 1;
    long want = max_threads == 0 ? hw : (long)max_threads;
    if (want > 64) want = 64;
    // ~4 MB of ASCII output per worker (~170k values)
    long by_size = max_threads == 0 ? count / 170000 + 1 : count;
    long T = want < by_size ? want : by_size;
    if (T < 1) T = 1;
    if (T > count) T = count;

    std::vector<std::string> bufs((size_t)T);
    if (T == 1) {
        format_range(vals, 0, count, lead_sep != 0, &bufs[0]);
    } else {
        std::vector<std::thread> workers;
        workers.reserve((size_t)T);
        for (long i = 0; i < T; ++i) {
            long lo = (count * i) / T;
            long hi = (count * (i + 1)) / T;
            bool ls = (i == 0) ? (lead_sep != 0) : true;
            workers.emplace_back(format_range, vals, lo, hi, ls, &bufs[i]);
        }
        for (auto& w : workers) w.join();
    }
    int rc = 0;
    for (auto& b : bufs) {
        if (!b.empty() && fwrite(b.data(), 1, b.size(), f) != b.size()) {
            rc = 2;
            break;
        }
    }
    if (fclose(f) != 0 && rc == 0) rc = 3;
    return rc;
}

}  // extern "C"
