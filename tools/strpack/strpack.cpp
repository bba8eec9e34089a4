// strpack: native ragged→fixed string plane packer.
//
// The engine's VARCHAR ingest turns a ragged UTF-8 blob (+ u32 lengths)
// into a zero-padded fixed-width byte matrix [n, maxlen] so numpy can
// dictionary-encode it with one C-speed bytes sort. Doing that reshape in
// numpy needs an (n, maxlen) int64 fancy-index matrix — gigabytes of
// index traffic for SF10+ comment columns (measured 289 s for 15M rows).
// Here it is what it really is: n parallel memcpys (~1 s).
//
// Reference analog: the reference ingests VARCHAR via string_t pointers
// into row-group blobs (/root/reference/src/include/duckdb/common/types/
// string_type.hpp); this engine's columnar-plane model wants the matrix
// form instead.
//
// Built as a shared library, called through ctypes (no pybind11 in this
// image). All buffers are caller-allocated numpy arrays.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// out must be pre-zeroed, size n*maxlen.
void pack_ragged(const uint8_t *blob, const int64_t *offsets,
                 const uint32_t *lens, int64_t n, int64_t maxlen,
                 uint8_t *out) {
	int nthreads = (int)std::thread::hardware_concurrency();
	if (nthreads < 1) nthreads = 1;
	if (n < 65536) nthreads = 1;
	std::vector<std::thread> ts;
	int64_t chunk = (n + nthreads - 1) / nthreads;
	for (int t = 0; t < nthreads; t++) {
		int64_t lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
		if (lo >= hi) break;
		ts.emplace_back([=] {
			for (int64_t i = lo; i < hi; i++) {
				uint32_t l = lens[i];
				if ((int64_t)l > maxlen) l = (uint32_t)maxlen;
				memcpy(out + i * maxlen, blob + offsets[i], l);
			}
		});
	}
	for (auto &t : ts) t.join();
}

}  // extern "C"
