// Shim sdsl/int_vector.hpp: plain bit_vector with the API surface the
// reference uses (MIBFConstructSupport.hpp:63,83,102-158: size(), data(),
// construction with a bit count, move-out via assignment).
#ifndef SHIM_SDSL_INT_VECTOR_HPP
#define SHIM_SDSL_INT_VECTOR_HPP

#include <cstddef>
#include <cstdint>
#include <string>
#include <vector>

namespace sdsl {

class bit_vector
{
public:
  bit_vector() = default;
  explicit bit_vector(size_t n, int value = 0)
    : m_n(n)
    , m_words((n + 63) / 64, value ? ~0ULL : 0ULL)
  {}

  size_t size() const { return m_n; }
  uint64_t* data() { return m_words.data(); }
  const uint64_t* data() const { return m_words.data(); }
  size_t num_words() const { return m_words.size(); }

  bool operator[](size_t i) const
  {
    return (m_words[i >> 6] >> (i & 63)) & 1ULL;
  }

private:
  size_t m_n = 0;
  std::vector<uint64_t> m_words;
};

template<typename X>
void
store_to_file(const X&, const std::string&)
{
  // dev-only MIBloomFilter::store path; never called by goldrush-path
}

} // namespace sdsl

#endif
