// Shim btllib/bloom_filter.hpp: minimal BloomFilter for the solid-kmer
// insertBV/insertMIBF overloads (MIBFConstructSupport.hpp:115-132,285-311),
// which goldrush-path never instantiates.
#ifndef SHIM_BTLLIB_BLOOM_FILTER_HPP
#define SHIM_BTLLIB_BLOOM_FILTER_HPP

#include <cstdint>
#include <vector>

namespace btllib {

class BloomFilter
{
public:
  bool contains(const std::vector<uint64_t>&) const { return false; }
  void insert(const std::vector<uint64_t>&) {}
};

} // namespace btllib

#endif
