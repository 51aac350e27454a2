#include "ImfOutputFile.h"
