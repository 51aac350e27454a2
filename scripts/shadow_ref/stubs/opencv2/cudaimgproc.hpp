#include "mini.hpp"
